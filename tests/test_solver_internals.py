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


class TestSolverGuards:
    def _make(self, tmp_path, n_scenes=2, batch_size=2):
        from pointnet2_scannet_tpu import models
        from pointnet2_scannet_tpu.config import (
            DataConfig, ModelConfig, RunConfig, TrainConfig,
        )
        from pointnet2_scannet_tpu.data import ChunkedSceneDataset
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
        from pointnet2_scannet_tpu.engine import Solver

        cfg = RunConfig(
            tag="guards",
            data=DataConfig(npoints=1024, use_color=True, use_normal=True),
            model=ModelConfig(is_msg=False),
            train=TrainConfig(batch_size=batch_size, epochs=2, lr=1e-3, seed=0),
        )
        store = make_synthetic_store(n_scenes=n_scenes, n_points=8_000)
        train_ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
        model = models.get_model(
            num_classes=cfg.model.num_classes,
            is_msg=False,
            input_channels=cfg.data.input_channels,
        )
        return model, train_ds, cfg

    def test_zero_train_batches_raises(self, tmp_path):
        # 2 scenes at batch_size 32 with drop_last -> zero batches: must fail
        # loudly at construction, not silently train nothing for 500 epochs
        model, train_ds, cfg = self._make(tmp_path, n_scenes=2, batch_size=32)
        from pointnet2_scannet_tpu.engine import Solver

        with pytest.raises(ValueError, match="zero"):
            Solver(model, train_ds, None, cfg, tmp_path)

    def test_model_last_written_every_epoch(self, tmp_path):
        # a crash in epoch 2 must leave epoch 1's model_last for resume()
        model, train_ds, cfg = self._make(tmp_path)
        from pointnet2_scannet_tpu.engine import Solver

        solver = Solver(model, train_ds, None, cfg, tmp_path)
        orig_regen = solver._regenerate
        calls = {"n": 0}

        def crashing_regen():
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("simulated crash in epoch 2")
            orig_regen()

        solver._regenerate = crashing_regen
        with pytest.raises(RuntimeError, match="simulated crash"):
            solver(epochs=2, verbose=100)
        assert (tmp_path / "model_last.msgpack").exists()
        fresh = Solver(model, train_ds, None, cfg, tmp_path)
        assert fresh.resume() == 1  # epoch 0 completed; resume from epoch 1

    def test_trace_dir_captures_profile(self, tmp_path):
        # --trace DIR wraps one train epoch (the second, so compiles stay
        # out of the timeline) in jax.profiler.trace and writes an XPlane
        # trace TensorBoard/XProf can open
        model, train_ds, cfg = self._make(tmp_path)
        from pointnet2_scannet_tpu.engine import Solver

        trace_dir = tmp_path / "trace"
        solver = Solver(
            model, train_ds, None, cfg, tmp_path / "run",
            compute_voxel_metrics=False, trace_dir=trace_dir,
        )
        solver(epochs=2, verbose=100)
        assert solver.trace_dir is None  # captured exactly once
        planes = list(trace_dir.rglob("*.xplane.pb"))
        assert planes, f"no xplane trace written under {trace_dir}"


class TestRunModeSerialization:
    """--resume must rebuild the same KIND of run: the mode flags
    (use_wholescene/synthetic/debug) are serialized in TrainConfig and the
    train CLI derives datasets/solver class from the saved config."""

    def _train_mod(self):
        import importlib.util
        import pathlib

        p = pathlib.Path(__file__).parent.parent / "scripts" / "train.py"
        spec = importlib.util.spec_from_file_location("train_cli", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_mode_flags_roundtrip(self, tmp_path):
        from pointnet2_scannet_tpu.config import RunConfig

        mod = self._train_mod()
        args = mod.parse_args(
            ["--use_wholescene", "--synthetic", "--synthetic_scenes", "3",
             "--tag", "mode"]
        )
        cfg = mod.build_config(args)
        assert cfg.train.wholescene and cfg.train.synthetic
        assert cfg.train.synthetic_scenes == 3 and not cfg.train.debug
        cfg.save(tmp_path / "config.json")
        back = RunConfig.load(tmp_path / "config.json")
        assert back.train.wholescene and back.train.synthetic
        assert back.train.synthetic_scenes == 3

    def test_old_config_without_mode_fields_loads(self, tmp_path):
        # pre-round-3 config.json files lack the mode keys: defaults apply
        import json

        from pointnet2_scannet_tpu.config import RunConfig

        mod = self._train_mod()
        cfg = mod.build_config(mod.parse_args(["--tag", "old"]))
        raw = json.loads(cfg.to_json())
        for k in ("wholescene", "synthetic", "synthetic_scenes", "debug"):
            raw["train"].pop(k)
        back = RunConfig.from_json(json.dumps(raw))
        assert not back.train.wholescene and not back.train.synthetic

    def test_make_stores_follows_config_not_args(self):
        from pointnet2_scannet_tpu.parallel import ProcessContext

        mod = self._train_mod()
        args = mod.parse_args(["--synthetic", "--synthetic_scenes", "4"])
        cfg = mod.build_config(args)
        train_store, val_store = mod.make_stores(cfg, ProcessContext.single())
        assert len(train_store.scene_ids) == 4
        assert len(val_store.scene_ids) == 1

    def test_make_stores_shards_scenes_with_global_weights(self):
        # multi-host chunked mode: disjoint equal scene shards per process,
        # label weights identical on every shard (computed pre-shard)
        from pointnet2_scannet_tpu.parallel import ProcessContext

        mod = self._train_mod()
        args = mod.parse_args(["--synthetic", "--synthetic_scenes", "5"])
        cfg = mod.build_config(args)
        full, _ = mod.make_stores(cfg, ProcessContext.single())
        s0, _ = mod.make_stores(cfg, ProcessContext(0, 2))
        s1, _ = mod.make_stores(cfg, ProcessContext(1, 2))
        assert len(s0) == len(s1) == 2  # 5 scenes -> 2+2, 1 dropped
        assert not set(s0.scene_ids) & set(s1.scene_ids)
        assert set(s0.scene_ids) | set(s1.scene_ids) <= set(full.scene_ids)
        np.testing.assert_array_equal(s0.label_weights, full.label_weights)
        np.testing.assert_array_equal(s1.label_weights, full.label_weights)
