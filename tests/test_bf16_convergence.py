"""bf16 training convergence — VERDICT r3 #2.

The bf16 recipe (model compute_dtype=bfloat16; params, optimizer state and
loss stay f32) is the 7.07M pts/s headline in BENCH_r03.json, and its packed
[xyz_hi|xyz_lo|feats] grouping truncates coordinates to a 2x-bf16 split
(error ~eps*radius, op-tested at tests/test_ops.py). This regression shows
the throughput-vs-accuracy trade holds: a bf16 TRAINING run on the same
synthetic config reaches f32-comparable validation quality, so the headline
is a validated recipe, not just a fast one. Reference match: BASELINE.md
"exceed CUDA points/sec" row is quotable at the bf16 number only with this.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
from pointnet2_scannet_tpu.data import ChunkedSceneDataset
from pointnet2_scannet_tpu.engine import Solver
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store


def _train(tmp_path, store, *, dtype, epochs):
    cfg = RunConfig(
        tag=f"bf16-conv-{'bf16' if dtype is not None else 'f32'}",
        data=DataConfig(npoints=1024, use_color=True, use_normal=True),
        model=ModelConfig(
            is_msg=False,
            compute_dtype="bfloat16" if dtype is not None else "float32",
        ),
        train=TrainConfig(batch_size=4, epochs=epochs, lr=1e-3, verbose=100, seed=0),
    )
    train_ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
    val_ds = ChunkedSceneDataset(store, cfg.data, phase="val", seed=1)
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=False,
        input_channels=cfg.data.input_channels,
        dtype=dtype,
    )
    out = tmp_path / cfg.tag
    out.mkdir()
    solver = Solver(model, train_ds, val_ds, cfg, out, compute_voxel_metrics=True)
    solver(epochs=epochs, verbose=100)
    losses = [v for _, v in solver.logger.scalars["train/loss"]]
    mious = [v for _, v in solver.logger.scalars["val/point_miou"]]
    return losses, mious


@pytest.mark.slow
def test_bf16_training_matches_f32_quality(tmp_path):
    epochs = 12
    store = make_synthetic_store(n_scenes=4, n_points=15_000)
    f32_losses, f32_mious = _train(tmp_path, store, dtype=None, epochs=epochs)
    bf_losses, bf_mious = _train(tmp_path, store, dtype=jnp.bfloat16, epochs=epochs)

    # bf16 must LEARN on its own terms (same bars as the f32 e2e regression)
    assert np.mean(bf_losses[-3:]) < np.mean(bf_losses[:3]) * 0.9, bf_losses
    assert np.mean(bf_mious[-3:]) > np.mean(bf_mious[:3]) + 0.02, bf_mious

    # and land within a small delta of the f32 run's final validation mIoU.
    # Synthetic 12-epoch runs are noisy (chunks resample per epoch); compare
    # the settled tail means with an absolute tolerance well below the
    # f32-vs-f32 seed-to-seed spread on this fixture.
    f32_tail = float(np.mean(f32_mious[-3:]))
    bf_tail = float(np.mean(bf_mious[-3:]))
    assert bf_tail > f32_tail - 0.05, (f32_mious, bf_mious)
