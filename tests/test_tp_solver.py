"""Tensor parallelism as a PRODUCTION path (VERDICT r3 #7): the Solver must
auto-select the sharding-agnostic GSPMD step on a (dp, tp) 2-D mesh, keep the
Dense kernels + Adam moments tp-sharded across steps, learn on synthetic
scenes, and be reachable from the train CLI via --tp.

Step-level numerics (dp x tp == dp-only) are covered by
tests/test_parallel.py::TestTensorParallel; this file covers the Solver and
CLI layers above it.
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import jax

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import DataConfig, ModelConfig, RunConfig, TrainConfig
from pointnet2_scannet_tpu.data import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
from pointnet2_scannet_tpu.engine import Solver
from pointnet2_scannet_tpu.parallel import make_mesh_2d

REPO = pathlib.Path(__file__).resolve().parent.parent


def _build_solver(tmp_path, *, epochs=6, fused_steps=1, bn_axis_name=None):
    cfg = RunConfig(
        tag="tp-test",
        data=DataConfig(npoints=1024, use_color=True, use_normal=True),
        model=ModelConfig(is_msg=False),
        train=TrainConfig(
            batch_size=4, epochs=epochs, lr=1e-3, verbose=100, seed=0,
            fused_steps=fused_steps, tp=2,
        ),
    )
    store = make_synthetic_store(n_scenes=4, n_points=15_000)
    train_ds = ChunkedSceneDataset(store, cfg.data, phase="train", seed=0)
    val_ds = ChunkedSceneDataset(store, cfg.data, phase="val", seed=1)
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
        bn_axis_name=bn_axis_name,
    )
    mesh = make_mesh_2d(4, 2)
    return (
        Solver(model, train_ds, val_ds, cfg, tmp_path, mesh=mesh),
        cfg,
    )


def _tp_kernel_specs(state):
    specs = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        if getattr(leaf, "ndim", 0) == 2 and leaf.shape[1] % 2 == 0:
            specs.append((path, leaf.sharding.spec))
    return specs


class TestSolverTensorParallel:
    def test_rejects_bn_axis_model_on_2d_mesh(self, tmp_path):
        with pytest.raises(ValueError, match="dp x tp"):
            _build_solver(tmp_path, bn_axis_name="dp")

    @pytest.mark.slow
    def test_gspmd_dp_tp_trains_and_keeps_layout(self, tmp_path):
        solver, cfg = _build_solver(tmp_path, epochs=6, fused_steps=2)
        assert solver.parallel_strategy == "gspmd_dp_tp"
        # the initial state really is tensor-parallel, not replicated
        specs = _tp_kernel_specs(solver.state)
        assert specs and all(
            s == jax.sharding.PartitionSpec(None, "tp") for _, s in specs
        ), specs

        solver(epochs=cfg.train.epochs, verbose=100)

        # donation + GSPMD propagation must keep the tp layout across the
        # whole run (a silent all-gather would leave kernels replicated)
        specs_after = _tp_kernel_specs(solver.state)
        assert specs_after and all(
            s == jax.sharding.PartitionSpec(None, "tp") for _, s in specs_after
        ), specs_after

        losses = [v for _, v in solver.logger.scalars["train/loss"]]
        assert np.mean(losses[-2:]) < np.mean(losses[:2]) * 0.95, losses
        assert (tmp_path / "model_last.msgpack").exists()

        # resume must re-establish the tp layout from host-restored leaves
        start = solver.resume()
        assert start == cfg.train.epochs
        specs_resumed = _tp_kernel_specs(solver.state)
        assert all(
            s == jax.sharding.PartitionSpec(None, "tp") for _, s in specs_resumed
        )


@pytest.mark.slow
def test_train_cli_tp_flag(tmp_path):
    """--tp 2 end to end through the real CLI on the virtual 8-device mesh."""
    runs = tmp_path / "runs"
    args = [
        "--synthetic", "--synthetic_scenes", "4", "--npoints", "512",
        "--batch_size", "4", "--epoch", "1", "--verbose", "1",
        "--num_devices", "8", "--tp", "2", "--fused_steps", "2",
        "--tag", "TPTEST", "--output_root", str(runs),
    ]
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = ['scripts/train.py'] + {args!r}; "
        f"runpy.run_path({str(REPO / 'scripts/train.py')!r}, run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", boot], cwd=REPO, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-4000:] + proc.stderr[-4000:]
    assert "parallel strategy: gspmd_dp_tp" in proc.stdout
    run_dir = next(runs.glob("*_TPTEST"))
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["train"]["tp"] == 2
    assert (run_dir / "model_last.msgpack").exists()
