"""Typed configuration for the framework.

Replaces the reference's import-time EasyDict global (lib/config.py) with
explicit dataclasses: paths are injected, not hardcoded; run configs are
serialized next to checkpoints so eval/vis never have to repeat model flags
(the reference silently mis-builds the model if eval flags drift from the
training flags — README.md:85,93).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any

# ScanNet v2 semantic segmentation label set: 20 NYU classes
# (lib/config.py:40-62). Preprocessed scenes store semantic labels directly
# as 0..19 indices into this tuple (data/scannet_prep.py stores
# NYU_CLASSES.index(name); see also data/scene_store.py) — no shift is
# applied anywhere at training time. Unknown raw labels map to "otherprop".
NYU_CLASSES = (
    "floor", "wall", "cabinet", "bed", "chair", "sofa", "table", "door",
    "window", "bookshelf", "picture", "counter", "desk", "curtain",
    "refrigerator", "bathtub", "shower curtain", "toilet", "sink", "otherprop",
)
NUM_CLASSES = len(NYU_CLASSES)

# RGB palette for PLY visualization (lib/config.py:63-84).
PALETTE = (
    (152, 223, 138), (174, 199, 232), (31, 119, 180), (255, 187, 120),
    (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40),
    (197, 176, 213), (148, 103, 189), (196, 156, 148), (23, 190, 207),
    (247, 182, 210), (219, 219, 141), (255, 127, 14), (227, 119, 194),
    (158, 218, 229), (44, 160, 44), (112, 128, 144), (82, 84, 163),
)

# Preprocessed scene column layout, (N, 11):
# [x, y, z, r, g, b, nx, ny, nz, instance_label, semantic_label]
# (preprocessing/collect_scannet_scenes.py:68-72)
SCENE_COLUMNS = 11


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Filesystem roots (reference: lib/config.py:7-38, hardcoded there)."""

    scannet_dir: str = "data/scannet"
    scans_dir: str = "data/scannet/scans"
    preprocessed_dir: str = "data/preprocessed_scenes"
    multiview_h5: str = "data/enet_feats.hdf5"
    output_root: str = "outputs"
    train_list: str = "data/scannetv2_train.txt"
    val_list: str = "data/scannetv2_val.txt"
    test_list: str = "data/scannetv2_test.txt"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Chunking/augmentation knobs (reference defaults from lib/dataset.py)."""

    npoints: int = 8192
    chunk_size_xy: float = 1.5  # chunk footprint, meters (dataset.py:219-221)
    chunk_margin: float = 0.2  # slack for the point crop (dataset.py:225)
    chunk_retries: int = 5  # validity retry attempts (dataset.py:219)
    min_annotated_frac: float = 0.7  # dataset.py:240
    min_voxel_occupancy: float = 0.02  # dataset.py:240
    is_weighting: bool = True  # 1/log(1.2+freq) class weights (dataset.py:56)
    use_color: bool = False
    use_normal: bool = False
    use_multiview: bool = False
    augment: bool = True

    @property
    def input_channels(self) -> int:
        """Feature channels beyond xyz (mirrors scripts/train.py:39)."""
        return 3 * self.use_color + 3 * self.use_normal + 128 * self.use_multiview


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_classes: int = NUM_CLASSES
    is_msg: bool = False
    use_xyz: bool = True
    bn: bool = True
    compute_dtype: str = "float32"  # "bfloat16" for the fast path


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization recipe (reference defaults: scripts/train.py:108-129)."""

    batch_size: int = 32
    epochs: int = 500
    lr: float = 1e-3
    weight_decay: float = 0.0
    decay_step: int = 100  # StepLR step, in epochs (--ds)
    decay_factor: float = 0.7  # StepLR gamma (--df)
    verbose: int = 10  # iteration report cadence
    seed: int = 0
    no_weighting: bool = False
    num_devices: int | None = None  # data-parallel width (None = all devices)
    # tensor-parallel width: >1 builds a (dp, tp) 2-D mesh — Dense kernels +
    # Adam moments sharded over tp (parallel/mesh.train_state_shardings), the
    # Solver selects the sharding-agnostic GSPMD step ("gspmd_dp_tp"). For
    # this ~1M-param pointwise-MLP model dp alone is usually faster; tp is
    # for when per-device memory, not compute, is the binding constraint.
    tp: int = 1
    # shuffle scene order across train batches each epoch. Default False for
    # PARITY: the reference DataLoader is built without shuffle
    # (scripts/train.py:26), so epoch-over-epoch batch COMPOSITION is the
    # same scene-sets every epoch (chunks resample, grouping doesn't) — a
    # shared quirk and the first suspect if real-data runs undershoot the
    # mIoU gates. --shuffle breaks the grouping.
    shuffle: bool = False
    # device-resident scene store: upload every scene's assembled features +
    # labels to HBM once and ship only (B, npoints) row indices + per-chunk
    # augmentation params per step — the gather/augment/weight-lookup run
    # inside the jitted step (data/resident.py). Execution-layout flag
    # (identical math to the host path, tested); single-process dp-only runs;
    # the Solver falls back with a warning when the store exceeds the HBM
    # budget or the run shape doesn't support it.
    device_store: bool = False
    # dispatch K sequential optimizer steps as ONE lax.scan program (exact
    # same math — see parallel.step.make_fused_train_step; removes per-step
    # host dispatch latency). 1 = per-batch dispatch; leftovers when the
    # epoch length doesn't divide K run per-batch.
    fused_steps: int = 1
    # run-mode knobs, serialized so --resume rebuilds the SAME kind of run
    # (a whole-scene run silently resumed as a chunked Solver run trains the
    # wrong recipe without erroring):
    wholescene: bool = False  # --use_wholescene (grad-accum per scene)
    synthetic: bool = False  # --synthetic (generated scenes, no ScanNet)
    synthetic_scenes: int = 8
    debug: bool = False  # --debug (single-scene train/val)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    """Everything needed to rebuild a run: serialized into the output dir."""

    tag: str = "run"
    paths: PathConfig = dataclasses.field(default_factory=PathConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "RunConfig":
        raw: dict[str, Any] = json.loads(text)
        return cls(
            tag=raw.get("tag", "run"),
            paths=PathConfig(**raw.get("paths", {})),
            data=DataConfig(**raw.get("data", {})),
            model=ModelConfig(**raw.get("model", {})),
            train=TrainConfig(**raw.get("train", {})),
        )

    def save(self, path: str | pathlib.Path) -> None:
        pathlib.Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "RunConfig":
        return cls.from_json(pathlib.Path(path).read_text())
