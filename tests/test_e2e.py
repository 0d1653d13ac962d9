"""End-to-end slice: train the SSG model on synthetic scenes and verify the
loss decreases and accuracy rises — the analog of the reference's --debug
single-scene fixture (scripts/train.py:72-74)."""

import dataclasses

import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
from pointnet2_scannet_tpu.data import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
from pointnet2_scannet_tpu.engine import Solver
from pointnet2_scannet_tpu.engine.metrics import confusion_to_point_metrics


@pytest.mark.slow
def test_loss_decreases_on_synthetic_scene(tmp_path):
    epochs = 12
    cfg = RunConfig(
        tag="e2e-test",
        data=DataConfig(npoints=1024, use_color=True, use_normal=True),
        model=ModelConfig(is_msg=False),
        train=TrainConfig(batch_size=4, epochs=epochs, lr=1e-3, verbose=100, seed=0),
    )
    store = make_synthetic_store(n_scenes=4, n_points=15_000)
    train_ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
    val_ds = ChunkedSceneDataset(store, cfg.data, phase="val", seed=1)
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
    )
    solver = Solver(
        model, train_ds, val_ds, cfg, tmp_path, compute_voxel_metrics=True
    )
    best = solver(epochs=epochs, verbose=100)

    # learning signal over 12 epochs on 4 easy synthetic scenes: loss trends
    # down (chunks resample every epoch, so it's noisy) AND val mIoU rises
    train_losses = [v for _, v in solver.logger.scalars["train/loss"]]
    first = np.mean(train_losses[:3])
    last = np.mean(train_losses[-3:])
    assert last < first * 0.9, train_losses
    mious = [v for _, v in solver.logger.scalars["val/point_miou"]]
    assert np.mean(mious[-3:]) > np.mean(mious[:3]) + 0.02, mious
    # artifacts written
    assert (tmp_path / "config.json").exists()
    assert (tmp_path / "model_last.msgpack").exists()
    assert (tmp_path / "model_best.msgpack").exists()
    assert (tmp_path / "best.txt").exists()
    assert best["voxel_miou"] >= 0.0
