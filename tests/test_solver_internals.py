"""Solver/internal-plumbing tests that don't need a full training run."""

import json

import numpy as np
import pytest

from pointnet2_scannet_tpu.data.pipeline import prefetch_to_device
from pointnet2_scannet_tpu.engine.logging import ScalarLogger
from pointnet2_scannet_tpu.utils.profiling import StepTimer, device_memory_stats


class TestPrefetch:
    def test_yields_all_items_in_order(self):
        items = [{"points": np.full((2, 4), i)} for i in range(5)]
        out = list(prefetch_to_device(iter(items)))
        assert len(out) == 5
        for i, batch in enumerate(out):
            np.testing.assert_array_equal(np.asarray(batch["points"]), items[i]["points"])

    def test_producer_exception_propagates(self):
        def bad():
            yield {"points": np.zeros((1,))}
            raise RuntimeError("boom in producer")

        gen = prefetch_to_device(bad())
        next(gen)
        with pytest.raises(RuntimeError, match="boom in producer"):
            list(gen)


class TestScalarLogger:
    def test_export_roundtrip(self, tmp_path):
        log = ScalarLogger(tmp_path, use_tensorboard=False)
        log.add_scalars("train", {"loss": 1.5, "acc": 0.5}, step=0)
        log.add_scalar("train/loss", 1.2, step=1)
        log.close()
        data = json.loads((tmp_path / "tensorboard" / "all_scalars.json").read_text())
        assert data["train/loss"] == [[0, 1.5], [1, 1.2]]
        assert data["train/acc"] == [[0, 0.5]]


class TestStepTimer:
    def test_means(self):
        t = StepTimer()
        with t.measure("fetch"):
            pass
        with t.measure("fetch"):
            pass
        with t.measure("step"):
            pass
        s = t.summary()
        assert set(s) == {"fetch", "step"}
        assert t.counts["fetch"] == 2
        t.reset()
        assert not t.totals


class TestDeviceMemoryStats:
    def test_returns_per_device(self):
        import jax

        stats = device_memory_stats()
        assert len(stats) == len(jax.devices())
        assert all("device" in s for s in stats)


class TestSolverResume:
    @pytest.mark.slow
    def test_resume_restores_best_and_epoch(self, tmp_path):
        from pointnet2_scannet_tpu import models
        from pointnet2_scannet_tpu.config import (
            DataConfig,
            ModelConfig,
            RunConfig,
            TrainConfig,
        )
        from pointnet2_scannet_tpu.data import ChunkedSceneDataset
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
        from pointnet2_scannet_tpu.engine import Solver

        cfg = RunConfig(
            data=DataConfig(npoints=1024),
            model=ModelConfig(is_msg=False),
            train=TrainConfig(batch_size=2, epochs=2, verbose=100, seed=0),
        )
        store = make_synthetic_store(n_scenes=2, n_points=8000)
        tr = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
        va = ChunkedSceneDataset(store, cfg.data, phase="val", seed=1)
        model = models.get_model(20, is_msg=False, input_channels=0)
        s1 = Solver(model, tr, va, cfg, tmp_path, compute_voxel_metrics=False)
        s1(epochs=2, verbose=100)
        step_after = int(s1.state.step)
        best = dict(s1.best)

        s2 = Solver(model, tr, va, cfg, tmp_path, compute_voxel_metrics=False)
        start = s2.resume("model_last")
        assert start == 2
        assert int(s2.state.step) == step_after
        assert s2.best["epoch"] == best["epoch"]
        # resuming at the configured epoch count runs no further epochs
        out = s2(epochs=2, verbose=100, start_epoch=start)
        assert int(s2.state.step) == step_after
