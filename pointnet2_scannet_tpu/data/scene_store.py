"""In-memory scene store and feature assembly.

Mirrors the loading half of the reference datasets (lib/dataset.py:29-58 and
:265-292): preprocessed scenes are (N, 11) float npy arrays laid out as
[xyz, rgb(0-255), normal, instance_label, semantic_label] with semantic
labels in 0..19 (preprocessing/collect_scannet_scenes.py:63-72), plus an
optional per-scene (N, 128) multiview feature bank from one HDF5 file.

One deliberate deviation (SURVEY.md quirk 1): the reference concatenates
feature columns in a DIFFERENT order for chunked training
([xyz, multiview, color, normal], lib/dataset.py:72-80) vs whole-scene eval
([xyz, color, normal, multiview], :303-311) — a real train/eval skew for
multiview configs. This framework uses [xyz, color, normal, multiview]
everywhere.
"""

from __future__ import annotations

import pathlib
from collections.abc import Sequence

import numpy as np

from pointnet2_scannet_tpu.config import NUM_CLASSES


def label_counts(labels_per_scene, num_classes: int = NUM_CLASSES) -> np.ndarray:
    """Per-class label histogram over an iterable of per-scene label arrays
    (generators of mmap'd columns work — one scene resident at a time)."""
    counts = np.zeros(num_classes, np.float64)
    for seg in labels_per_scene:
        tmp, _ = np.histogram(seg, bins=range(num_classes + 1))
        counts += tmp
    return counts


def weights_from_counts(counts: np.ndarray) -> np.ndarray:
    """Inverse-log-frequency class weights: 1/log(1.2 + freq)
    (lib/dataset.py:48-56)."""
    freq = counts.astype(np.float32) / max(counts.sum(), 1.0)
    return (1.0 / np.log(1.2 + freq)).astype(np.float32)


def compute_label_weights(
    labels_per_scene, num_classes: int = NUM_CLASSES
) -> np.ndarray:
    """Inverse-log-frequency class weights over a whole split
    (lib/dataset.py:48-56)."""
    return weights_from_counts(label_counts(labels_per_scene, num_classes))


def assemble_features(
    scene: np.ndarray,
    multiview: np.ndarray | None,
    *,
    use_color: bool,
    use_normal: bool,
    use_multiview: bool,
) -> np.ndarray:
    """Build the (N, 3 + C) input columns in canonical order
    [xyz, color/255, normal, multiview]."""
    cols = [scene[:, :3]]
    if use_color:
        cols.append(scene[:, 3:6] / 255.0)  # rgb to [0, 1] (dataset.py:69)
    if use_normal:
        cols.append(scene[:, 6:9])
    if use_multiview:
        if multiview is None:
            raise ValueError("use_multiview=True but no multiview features given")
        cols.append(multiview)
    return np.concatenate(cols, axis=1).astype(np.float32)


class SceneStore:
    """Holds all scenes of a split in RAM (the reference does the same,
    lib/dataset.py:29-47 — ScanNet preprocessed scenes are ~GBs total)."""

    def __init__(
        self,
        scene_ids: Sequence[str],
        scenes: dict[str, np.ndarray],
        multiview: dict[str, np.ndarray] | None = None,
        num_classes: int = NUM_CLASSES,
        is_weighting: bool = True,
    ):
        self.scene_ids = list(scene_ids)
        self.scenes = scenes
        self.multiview = multiview or {}
        self.num_classes = num_classes
        if is_weighting:
            self.label_weights = compute_label_weights(
                [scenes[sid][:, 10] for sid in self.scene_ids], num_classes
            )
        else:
            self.label_weights = np.ones(num_classes, np.float32)

    @classmethod
    def from_npy_dir(
        cls,
        scene_ids: Sequence[str],
        preprocessed_dir: str | pathlib.Path,
        multiview_h5: str | pathlib.Path | None = None,
        **kwargs,
    ) -> "SceneStore":
        """Load `<dir>/<scene_id>.npy` files (+ optional multiview HDF5)."""
        root = pathlib.Path(preprocessed_dir)
        scenes = {sid: np.load(root / f"{sid}.npy") for sid in scene_ids}
        multiview = None
        if multiview_h5 is not None:
            import h5py

            multiview = {}
            with h5py.File(multiview_h5, "r") as f:
                for sid in scene_ids:
                    multiview[sid] = f[sid][()]
        return cls(scene_ids, scenes, multiview, **kwargs)

    @classmethod
    def from_npy_dir_sharded(
        cls,
        scene_ids: Sequence[str],
        preprocessed_dir: str | pathlib.Path,
        multiview_h5: str | pathlib.Path | None = None,
        *,
        process_id: int,
        num_processes: int,
        num_classes: int = NUM_CLASSES,
        is_weighting: bool = True,
        equalize: bool = True,
        ctx=None,
    ) -> "SceneStore":
        """Pod-scale loading: hold full arrays (and multiview banks) only for
        THIS process's scene shard, while label weights still come from the
        WHOLE split. Shard semantics match SceneStore.shard (strided;
        equalize=True truncates to equal counts for training, False covers
        every scene for distributed eval).

        Global weights, two ways:
          - ctx given (a ProcessContext; every process must call this — it
            runs ONE collective): each process histograms only the labels it
            already loaded, the coordinator adds the equalize-dropped tail
            (<= num_processes-1 mmap'd label columns), and the counts sum
            across processes — no process ever re-reads the whole split.
          - ctx None: a streaming label-column pass over every scene on this
            process (one histogram resident at a time).
        """
        from pointnet2_scannet_tpu.parallel.distributed import strided_shard

        root = pathlib.Path(preprocessed_dir)
        my_ids = strided_shard(
            scene_ids, process_id, num_processes, equalize=equalize
        )
        store = cls.from_npy_dir(
            my_ids, preprocessed_dir, multiview_h5,
            num_classes=num_classes, is_weighting=False,
        )
        if not is_weighting:
            return store
        if ctx is not None and ctx.num_processes > 1:
            assert (ctx.process_id, ctx.num_processes) == (process_id, num_processes)
            counts = label_counts(
                (store.scenes[sid][:, 10] for sid in my_ids), num_classes
            )
            # the strided+equalized shards jointly cover scene_ids[:n*P]
            # exactly; the coordinator folds in the dropped tail so the
            # weights are the FULL split's
            n_covered = (
                (len(scene_ids) // num_processes) * num_processes
                if equalize else len(scene_ids)
            )
            if ctx.is_coordinator and n_covered < len(scene_ids):
                counts += label_counts(
                    (np.load(root / f"{sid}.npy", mmap_mode="r")[:, 10]
                     for sid in list(scene_ids)[n_covered:]),
                    num_classes,
                )
            store.label_weights = weights_from_counts(
                ctx.sum_across_processes(counts)
            )
        else:
            store.label_weights = compute_label_weights(
                (np.load(root / f"{sid}.npy", mmap_mode="r")[:, 10]
                 for sid in scene_ids),
                num_classes,
            )
        return store

    @classmethod
    def from_scenes(cls, scenes: dict[str, np.ndarray], **kwargs) -> "SceneStore":
        return cls(sorted(scenes), scenes, **kwargs)

    def shard(
        self, process_id: int, num_processes: int, *, equalize: bool = True
    ) -> "SceneStore":
        """This process's scene shard for multi-host data parallelism —
        strided; `equalize` truncates to equal counts (ProcessContext.
        shard_list semantics: TRAINING needs equal per-process steps-per-
        epoch or the per-step collectives deadlock; distributed EVAL has no
        per-step collectives and passes equalize=False to cover every
        scene). Label weights stay the GLOBAL split's weights: the reference
        derives them from the whole train set (lib/dataset.py:48-56), and
        per-shard weights would make the psum'd loss mix inconsistent
        weightings across hosts."""
        from pointnet2_scannet_tpu.parallel.distributed import strided_shard

        if num_processes <= 1:
            return self
        ids = strided_shard(
            self.scene_ids, process_id, num_processes, equalize=equalize
        )
        sub = SceneStore.__new__(SceneStore)
        sub.scene_ids = ids
        sub.scenes = {sid: self.scenes[sid] for sid in ids}
        sub.multiview = {sid: self.multiview[sid] for sid in ids if sid in self.multiview}
        sub.num_classes = self.num_classes
        sub.label_weights = self.label_weights
        return sub

    def __len__(self) -> int:
        return len(self.scene_ids)
