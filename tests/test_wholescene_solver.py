"""Whole-scene training mode: gradient-accumulated one-update-per-scene."""

import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
from pointnet2_scannet_tpu.data import WholeSceneDataset
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
from pointnet2_scannet_tpu.engine.solver import WholeSceneSolver


@pytest.mark.slow
def test_wholescene_training_runs_and_learns(tmp_path):
    cfg = RunConfig(
        tag="ws-test",
        data=DataConfig(npoints=1024, use_color=True, use_normal=True),
        model=ModelConfig(is_msg=False),
        train=TrainConfig(batch_size=4, epochs=2, lr=1e-3, verbose=100, seed=0),
    )
    store = make_synthetic_store(n_scenes=2, n_points=10_000, seed=0)
    train_ds = WholeSceneDataset(store, cfg.data, seed=0)
    val_ds = WholeSceneDataset(store, cfg.data, seed=1)
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
    )
    solver = WholeSceneSolver(model, train_ds, val_ds, cfg, tmp_path)
    # 2 scenes, one optimizer update per scene per epoch
    assert solver._steps_per_epoch() == 2
    best = solver(epochs=2, verbose=100)
    train_losses = [v for _, v in solver.logger.scalars["train/loss"]]
    assert len(train_losses) == 2
    assert np.isfinite(train_losses).all()
    assert int(solver.state.step) == 4  # 2 epochs x 2 scenes
    assert (tmp_path / "model_last.msgpack").exists()
    assert best["voxel_miou"] >= 0.0
