"""bf16-vs-f32 convergence on the REAL chip — the TPU leg of VERDICT r3 #2.

tests/test_bf16_convergence.py proves the recipe on the virtual CPU mesh;
this script drives the same comparison on the ambient device (the one real
v5e chip under axon) so DESIGN.md can record a hardware-measured number:
two 12-epoch synthetic SSG runs (identical store/seed), f32 then bf16
(compute_dtype=bfloat16, params/optimizer/loss f32, packed
[xyz_hi|xyz_lo|feats] 2x-bf16 coordinate grouping), reporting the settled
tail means of val point-mIoU and train loss for both as one JSON line.

  python -u scripts/convergence_bf16.py [--epochs 12] [--cpu] [--msg]

--msg drives the MSG (52.50-gate) model through the same comparison,
completing the recipe x dtype convergence matrix (SSG/MSG x f32/bf16).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def run(dtype_name: str, store, epochs: int, out_root: pathlib.Path, is_msg: bool = False):
    import jax.numpy as jnp

    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import (
        DataConfig,
        ModelConfig,
        RunConfig,
        TrainConfig,
    )
    from pointnet2_scannet_tpu.data import ChunkedSceneDataset
    from pointnet2_scannet_tpu.engine import Solver

    cfg = RunConfig(
        tag=f"bf16conv-{dtype_name}",
        data=DataConfig(npoints=1024, use_color=True, use_normal=True),
        model=ModelConfig(is_msg=is_msg, compute_dtype=dtype_name),
        train=TrainConfig(batch_size=4, epochs=epochs, lr=1e-3, verbose=100, seed=0),
    )
    train_ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
    val_ds = ChunkedSceneDataset(store, cfg.data, phase="val", seed=1)
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=is_msg,
        input_channels=cfg.data.input_channels,
        dtype=jnp.bfloat16 if dtype_name == "bfloat16" else None,
    )
    out = out_root / dtype_name
    out.mkdir(parents=True)
    solver = Solver(model, train_ds, val_ds, cfg, out, compute_voxel_metrics=True)
    solver(epochs=epochs, verbose=100)
    losses = [v for _, v in solver.logger.scalars["train/loss"]]
    mious = [v for _, v in solver.logger.scalars["val/point_miou"]]
    return losses, mious


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--msg", action="store_true", help="drive the MSG model instead of SSG")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    store = make_synthetic_store(n_scenes=4, n_points=15_000)
    with tempfile.TemporaryDirectory() as td:
        root = pathlib.Path(td)
        f32_losses, f32_mious = run("float32", store, args.epochs, root, is_msg=args.msg)
        bf_losses, bf_mious = run("bfloat16", store, args.epochs, root, is_msg=args.msg)

    def tail(xs):
        return float(np.mean(xs[-3:]))

    print(
        json.dumps(
            {
                "metric": ("msg_" if args.msg else "") + "bf16_vs_f32_val_point_miou_tail",
                "value": round(tail(bf_mious), 4),
                "unit": "mIoU",
                "f32_tail": round(tail(f32_mious), 4),
                "delta": round(tail(bf_mious) - tail(f32_mious), 4),
                "f32_loss_tail": round(tail(f32_losses), 4),
                "bf16_loss_tail": round(tail(bf_losses), 4),
                "epochs": args.epochs,
                "backend": "cpu" if args.cpu else "ambient (TPU under axon)",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
