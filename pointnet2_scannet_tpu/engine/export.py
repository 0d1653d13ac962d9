"""AOT model export for serving (jax.export / StableHLO).

The reference has no deployment story beyond cloning the repo and rebuilding
its CUDA extensions — its closest inference entrypoint is the evaluation
script (reference scripts/eval.py:174-221), which needs the full torch stack
and the model source. On TPU the idiomatic production path is ahead-of-time
export: the jitted eval-mode forward — checkpoint parameters baked in as
StableHLO constants — is lowered once into a single self-contained artifact
that a serving process can deserialize and execute with stock jax. No model
code, no checkpoint plumbing, no framework import; the artifact carries its
own input/output contract and the platform(s) it was lowered for.

Artifact contract (fixed shapes — TPU serving wants one compiled program,
not a shape family):
  input   (batch, npoints, channels) float32 point columns
  output  emit="labels": (batch, npoints) int8 (int32 if num_classes > 127)
          emit="logits": (batch, npoints, num_classes) model-dtype logits

`ServingPredictor` wraps either a live Exported or a deserialized artifact
and handles ragged column counts by batch-padding, so callers feed any
(S, npoints, channels) stack. Produced/consumed by scripts/infer.py.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from pointnet2_scannet_tpu.config import NUM_CLASSES
from pointnet2_scannet_tpu.engine.metrics import pred_transfer_dtype


def build_forward(apply_fn, variables, *, emit: str = "labels",
                  num_classes: int = NUM_CLASSES):
    """Eval-mode forward with params closed over (they export as constants).

    emit="labels" argmaxes on device and returns the narrowest integer dtype
    that holds a class id — the same 80x device->host transfer cut the
    evaluator uses (engine/evaluator.py); emit="logits" returns raw logits
    for callers that need calibration/ensembling.
    """
    if emit not in ("labels", "logits"):
        raise ValueError(f"emit must be 'labels' or 'logits', got {emit!r}")
    pred_dtype = pred_transfer_dtype(num_classes)

    def fwd(points):
        logits = apply_fn(variables, points, train=False)
        if emit == "labels":
            return jnp.argmax(logits, axis=-1).astype(pred_dtype)
        return logits

    return fwd


def export_forward(
    apply_fn,
    variables,
    *,
    batch_size: int,
    npoints: int,
    channels: int,
    emit: str = "labels",
    num_classes: int = NUM_CLASSES,
    platforms: list[str] | None = None,
) -> jax_export.Exported:
    """Lower the eval forward to a jax.export.Exported.

    platforms: lowering targets (e.g. ["tpu"], ["cpu", "tpu"]); None uses
    the current default backend. Multi-platform artifacts are larger but
    run anywhere listed.
    """
    fwd = build_forward(apply_fn, variables, emit=emit, num_classes=num_classes)
    spec = jax.ShapeDtypeStruct((batch_size, npoints, channels), jnp.float32)
    return jax_export.export(jax.jit(fwd), platforms=platforms)(spec)


def save_exported(exported: jax_export.Exported, path: str | pathlib.Path) -> pathlib.Path:
    path = pathlib.Path(path)
    path.write_bytes(exported.serialize())
    return path


def load_exported(path: str | pathlib.Path) -> jax_export.Exported:
    return jax_export.deserialize(bytearray(pathlib.Path(path).read_bytes()))


def run_kind(raw_config: dict) -> str:
    """Classify a run dir's config.json: 'semseg' (scripts/train.py writes a
    nested RunConfig), 'partseg' or 'cls' (the shape-family trainers write
    their flat argparse namespaces, partseg with a num_parts key)."""
    if "model" in raw_config and "data" in raw_config:
        return "semseg"
    return "partseg" if "num_parts" in raw_config else "cls"


def export_run(
    run_dir: str | pathlib.Path,
    *,
    checkpoint: str = "model_best",
    batch_size: int = 32,
    npoints: int | None = None,
    emit: str = "labels",
    platforms: list[str] | None = None,
) -> jax_export.Exported:
    """Export a trained run directory (config.json + <checkpoint>.msgpack).

    Covers all three model families — semantic segmentation
    (scripts/train.py), shape classification (train_cls.py) and part
    segmentation (train_partseg.py) — detecting the family from the run's
    serialized config, so the artifact can never drift from what was
    trained: the same no-drift rule the eval CLIs enforce (scripts/eval.py,
    eval_shapes.py). Label artifacts emit (B, npoints) part/class ids for
    the segmentation families and (B,) class ids for classification.
    """
    import json

    from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only

    run_dir = pathlib.Path(run_dir)
    raw = json.loads((run_dir / "config.json").read_text())
    kind = run_kind(raw)

    if kind == "semseg":
        from pointnet2_scannet_tpu import models
        from pointnet2_scannet_tpu.config import RunConfig

        cfg = RunConfig.load(run_dir / "config.json")
        model = models.get_model(
            num_classes=cfg.model.num_classes,
            is_msg=cfg.model.is_msg,
            input_channels=cfg.data.input_channels,
            use_xyz=cfg.model.use_xyz,
            bn=cfg.model.bn,
            dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None,
        )
        num_classes = cfg.model.num_classes
        channels = 3 + cfg.data.input_channels
        run_npoints = cfg.data.npoints
    else:
        from pointnet2_scannet_tpu.models import get_cls_model, get_partseg_model

        dtype = jnp.bfloat16 if raw.get("bf16") else None
        run_npoints = int(raw["npoints"])
        if kind == "partseg":
            num_classes = int(raw["num_parts"])
            num_categories = int(raw["categories"])
            # the category one-hot rides as the last channels (data/shapes.py)
            channels = 3 + num_categories
            model = get_partseg_model(
                num_classes, num_categories,
                is_msg=raw["use_msg"], bn=not raw["no_bn"], dtype=dtype,
            )
        else:
            num_classes = int(raw["classes"])
            channels = 3
            model = get_cls_model(
                num_classes,
                is_msg=raw["use_msg"], bn=not raw["no_bn"], dtype=dtype,
            )

    variables = restore_params_only(run_dir, checkpoint)
    return export_forward(
        model.apply,
        variables,
        batch_size=batch_size,
        npoints=npoints if npoints is not None else run_npoints,
        channels=channels,
        emit=emit,
        num_classes=num_classes,
        platforms=platforms,
    )


class ServingPredictor:
    """Run a (possibly deserialized) exported forward over ragged column stacks.

    The artifact is a fixed-(B, N, C) program; predict() pads an arbitrary
    (S, N, C) stack to a multiple of B with repeats of the last column and
    trims the outputs back, so whole-scene tilings of any width serve
    through the one compiled program.

    Multi-device scale-out: the program is batch-parallel with no
    cross-batch state, so pass `devices` (e.g. jax.devices()) to round-robin
    batches across chips — each device gets its own placement of the one
    compiled executable, dispatches are queued asynchronously on all of them
    (jax dispatch is async; the host only blocks at the final fetch), and
    outputs are reassembled in order. No mesh, no collectives: serving
    throughput scales with device count the embarrassingly-parallel way.
    """

    def __init__(self, exported: jax_export.Exported, devices=None):
        self.exported = exported
        aval = exported.in_avals[0]
        self.batch_size, self.npoints, self.channels = map(int, aval.shape)
        # jit(call) executes the embedded StableHLO natively (no re-trace of
        # model code — there is none here). Placement follows the committed
        # input arrays, so one jitted callable serves every device.
        self._call = jax.jit(exported.call)
        self.devices = list(devices) if devices else None

    @classmethod
    def from_artifact(
        cls, path: str | pathlib.Path, devices=None
    ) -> "ServingPredictor":
        return cls(load_exported(path), devices=devices)

    def predict(self, columns: np.ndarray) -> np.ndarray:
        """(S, npoints, channels) float32 -> stacked outputs with leading S."""
        columns = np.asarray(columns, np.float32)
        if columns.ndim != 3 or columns.shape[1:] != (self.npoints, self.channels):
            raise ValueError(
                f"expected (S, {self.npoints}, {self.channels}), got {columns.shape}"
            )
        s = columns.shape[0]
        if s == 0:
            out = self.exported.out_avals[0]
            return np.zeros((0, *out.shape[1:]), out.dtype)
        b = self.batch_size
        pad = (-s) % b
        if pad:
            columns = np.concatenate([columns, np.repeat(columns[-1:], pad, 0)])
        starts = range(0, len(columns), b)
        if self.devices:
            # enqueue every batch before fetching any: per-device queues run
            # concurrently while the host is still feeding the later ones
            futs = [
                self._call(
                    jax.device_put(
                        columns[i : i + b], self.devices[k % len(self.devices)]
                    )
                )
                for k, i in enumerate(starts)
            ]
            outs = [np.asarray(f) for f in futs]
        else:
            outs = [np.asarray(self._call(columns[i : i + b])) for i in starts]
        return np.concatenate(outs)[:s]
