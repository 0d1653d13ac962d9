"""Solver-level parallel-strategy selection (VERDICT r2 #1).

The production Solver must pick the explicit shard_map step on a dp-only
multi-device mesh when the model carries bn_axis_name (the pjit step would
all-gather the batch around the unpartitionable Pallas geometry kernels on a
real multi-chip mesh, parallel/step.py make_shardmap_train_step docstring) —
and the CLI must plumb bn_axis_name so this actually happens from
`scripts/train.py --num_devices 8`.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import DataConfig, RunConfig, TrainConfig
from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
from pointnet2_scannet_tpu.data.wholescene import WholeSceneDataset
from pointnet2_scannet_tpu.engine.solver import Solver, WholeSceneSolver
from pointnet2_scannet_tpu.parallel import make_mesh

REPO = pathlib.Path(__file__).resolve().parent.parent


def tiny_cfg(batch_size: int, npoints: int = 1024) -> RunConfig:
    return RunConfig(
        tag="t",
        data=DataConfig(npoints=npoints, use_color=True, use_normal=True),
        train=TrainConfig(batch_size=batch_size, epochs=1, verbose=1),
    )


def build_solver(tmp_path, n_devices: int, *, bn_axis: str | None,
                 wholescene: bool = False, n_scenes: int | None = None):
    cfg = tiny_cfg(batch_size=n_devices if n_devices > 1 else 2)
    store = make_synthetic_store(
        n_scenes if n_scenes is not None else max(n_devices, 2),
        seed=0, n_points=4096,
    )
    ds_cls = WholeSceneDataset if wholescene else ChunkedSceneDataset
    ds = (
        WholeSceneDataset(store, cfg.data, seed=0)
        if wholescene
        else ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
    )
    model = models.get_model(
        num_classes=20, is_msg=False,
        input_channels=cfg.data.input_channels, bn_axis_name=bn_axis,
    )
    mesh = make_mesh(n_devices)
    cls = WholeSceneSolver if wholescene else Solver
    return cls(model, ds, None, cfg, tmp_path, mesh=mesh)


class TestStrategySelection:
    def test_dp_mesh_with_bn_axis_selects_shardmap(self, tmp_path):
        solver = build_solver(tmp_path, 8, bn_axis="dp")
        assert solver.parallel_strategy == "shard_map_dp"

    def test_dp_mesh_without_bn_axis_falls_back_to_pjit(self, tmp_path, capsys):
        solver = build_solver(tmp_path, 8, bn_axis=None)
        assert solver.parallel_strategy == "pjit"
        assert "bn_axis_name" in capsys.readouterr().out

    def test_single_device_is_plain_jit(self, tmp_path):
        solver = build_solver(tmp_path, 1, bn_axis=None)
        assert solver.parallel_strategy == "single"

    def test_bn_axis_on_single_device_mesh_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="one device"):
            build_solver(tmp_path, 1, bn_axis="dp")

    def test_mismatched_bn_axis_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="does not match"):
            build_solver(tmp_path, 8, bn_axis="model")


@pytest.mark.slow
class TestShardMapSolverRuns:
    def test_chunked_solver_one_epoch(self, tmp_path):
        solver = build_solver(tmp_path, 8, bn_axis="dp")
        assert solver.parallel_strategy == "shard_map_dp"
        best = solver(epochs=1)
        assert (tmp_path / "model_last.msgpack").exists()
        # one full-batch step ran through the shard_map train step
        assert int(np.asarray(solver.state.step)) == 1

    def test_wholescene_solver_one_epoch(self, tmp_path):
        solver = build_solver(
            tmp_path, 8, bn_axis="dp", wholescene=True, n_scenes=1
        )
        assert solver.parallel_strategy == "shard_map_dp"
        solver(epochs=1)
        # one optimizer update per scene
        assert int(np.asarray(solver.state.step)) == 1


@pytest.mark.slow
class TestTrainCLISelectsShardMap:
    def test_train_cli_num_devices_8(self, tmp_path):
        """`scripts/train.py --num_devices 8` end-to-end on the virtual mesh:
        the CLI must build the model with bn_axis_name and the Solver must run
        the shard_map step (VERDICT r2 #1 'Done' criterion)."""
        boot = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import runpy, sys; sys.argv = ['scripts/train.py'] + "
            f"{['--synthetic', '--synthetic_scenes', '8', '--batch_size', '8', '--epoch', '1', '--npoints', '1024', '--use_color', '--use_normal', '--verbose', '1', '--num_devices', '8', '--tag', 'SMDP', '--output_root', str(tmp_path)]!r}; "
            f"runpy.run_path({str(REPO / 'scripts/train.py')!r}, run_name='__main__')"
        )
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        proc = subprocess.run(
            [sys.executable, "-c", boot],
            cwd=REPO, capture_output=True, text=True, timeout=900, env=env,
        )
        assert proc.returncode == 0, (
            f"train CLI failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}"
        )
        assert "parallel strategy: shard_map_dp" in proc.stdout
        run_dirs = list(tmp_path.glob("*_SMDP"))
        assert run_dirs and (run_dirs[0] / "model_last.msgpack").exists()


class TestFusedSolver:
    """TrainConfig.fused_steps > 1: the Solver dispatches K-step fused-scan
    groups plus per-batch leftovers, with identical training math."""

    def _solver(self, tmp_path, fused_steps: int, sub: str):
        cfg = RunConfig(
            tag="t",
            data=DataConfig(npoints=1024, use_color=True, use_normal=True),
            train=TrainConfig(
                batch_size=2, epochs=1, verbose=100, fused_steps=fused_steps
            ),
        )
        store = make_synthetic_store(7, seed=0, n_points=4096)
        ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
        model = models.get_model(
            num_classes=20, is_msg=False, input_channels=cfg.data.input_channels
        )
        out = tmp_path / sub
        out.mkdir()
        return Solver(model, ds, None, cfg, out, mesh=make_mesh(1))

    def test_fused_epoch_matches_unfused(self, tmp_path):
        # 7 scenes / batch 2 / drop_last -> 3 steps; fused_steps=2 runs one
        # fused (K=2) group + one per-batch leftover
        fused = self._solver(tmp_path, fused_steps=2, sub="fused")
        assert fused._fused_train_step is not None
        fused._regenerate()
        stats_fused = fused._run_train_epoch(0, 1, 100, __import__("time").time())
        assert int(np.asarray(fused.state.step)) == 3

        plain = self._solver(tmp_path, fused_steps=1, sub="plain")
        assert plain._fused_train_step is None
        plain._regenerate()
        stats_plain = plain._run_train_epoch(0, 1, 100, __import__("time").time())
        assert int(np.asarray(plain.state.step)) == 3

        # same chunks (same dataset seed), same per-step dropout keys
        # (train_step folds state.step) -> the epochs are the same math
        np.testing.assert_allclose(
            stats_fused["loss"], stats_plain["loss"], rtol=1e-5
        )
        np.testing.assert_allclose(
            stats_fused["point_acc"], stats_plain["point_acc"], atol=1e-6
        )
