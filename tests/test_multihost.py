"""Multi-host (pod-scale) training, exercised with REAL separate processes.

Unlike tests/test_parallel.py (one process, 8 virtual devices), these spawn
2 processes x 4 virtual CPU devices joined via jax.distributed — actual
cross-process collectives, actual per-process data feeding
(ProcessContext.place), actual coordinator write-gating. The reference has
no distributed capability at all (SURVEY.md §2.4); this is framework-new.

Both tests are subprocess-heavy (each worker compiles its own XLA programs)
— they are the multi-host analog of test_cli_integration.py.
"""

import json
import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(script: str, args: list[str], *, local_devices: int = 4):
    """Start one process of a distributed run, CPU-forced with its own
    virtual device count (the ambient env pins the TPU plugin; JAX_PLATFORMS
    is ignored — same bootstrap as test_cli_integration.run_cli)."""
    boot = (
        "import os; "
        f"os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count={local_devices}'; "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = [{script!r}] + {args!r}; "
        f"runpy.run_path({str(REPO / script)!r}, run_name='__main__')"
    )
    return subprocess.Popen(
        [sys.executable, "-c", boot],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def join_all(procs, timeout: int):
    outs = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((out, err))
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"process {i} failed (rc={p.returncode}):\n"
            f"STDOUT:\n{out[-4000:]}\nSTDERR:\n{err[-4000:]}"
        )
    return outs


@pytest.mark.slow
class TestDistributedStepAgreement:
    def test_two_process_step_matches_single_process(self, tmp_path):
        """3 shard_map train steps across 2 real processes == the same 3
        steps in ONE process on the 8-device mesh fed the concatenated
        global batches (the placement contract: process p's local rows land
        at global rows [p*B_local, (p+1)*B_local))."""
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene

        # scenes for the worker's sharded-weights check (5 -> 2+2, tail
        # scene's labels folded in by the coordinator)
        scene_dir = tmp_path / "scenes"
        scene_dir.mkdir()
        for i in range(5):
            np.save(
                scene_dir / f"s{i:02d}.npy", make_synthetic_scene(i, n_points=4000)
            )

        coord = f"127.0.0.1:{free_port()}"
        outs = [tmp_path / f"w{p}.npz" for p in range(2)]
        procs = [
            launch(
                "tests/multihost_worker.py",
                [str(p), "2", coord, str(outs[p]), str(scene_dir)],
            )
            for p in range(2)
        ]
        join_all(procs, timeout=900)

        w0 = np.load(outs[0])
        w1 = np.load(outs[1])
        # replication invariant: both processes hold bit-identical params
        np.testing.assert_array_equal(w0["params"], w1["params"])
        np.testing.assert_array_equal(w0["losses"], w1["losses"])

        # single-process reference on the concatenated global batches
        import jax

        from pointnet2_scannet_tpu import models
        from pointnet2_scannet_tpu.engine import train_state as ts
        from pointnet2_scannet_tpu.parallel import make_mesh, replicated
        from pointnet2_scannet_tpu.parallel.step import make_shardmap_train_step
        from tests.multihost_worker import flat_params, local_batches

        mesh = make_mesh(8)
        model = models.get_model(
            num_classes=20, is_msg=False, input_channels=0, bn_axis_name="dp"
        )
        tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
        state = ts.create_train_state(
            model, jax.random.key(0), np.zeros((1, 1024, 3), np.float32), tx
        )
        state = jax.device_put(state, replicated(mesh))
        key = jax.device_put(jax.random.key(1), replicated(mesh))
        step = make_shardmap_train_step(mesh, num_classes=20, donate=False)

        b0 = local_batches(0, n_steps=3, b_local=4, n=1024)
        b1 = local_batches(1, n_steps=3, b_local=4, n=1024)
        losses = []
        from jax.sharding import NamedSharding, PartitionSpec as P

        for a, b in zip(b0, b1):
            gbatch = {
                k: np.concatenate([a[k], b[k]]) for k in a
            }
            gbatch = jax.device_put(gbatch, NamedSharding(mesh, P("dp")))
            state, stats = step(state, gbatch, key)
            losses.append(float(np.asarray(stats["loss"])))

        # step 1 consumes identical params + identical global batch -> its
        # loss is the pure placement/data contract and must match tightly.
        # Later steps sit on top of updated params, where the cross-process
        # psum's different reduction order makes Adam flip near-zero-gradient
        # updates by a full lr (see test_parallel.py) — drift compounds, so
        # they get an lr-scaled budget instead of float tolerance.
        np.testing.assert_allclose(w0["losses"][0], losses[0], rtol=1e-6)
        np.testing.assert_allclose(w0["losses"], np.array(losses), rtol=5e-3)
        # every param within its 3-step Adam update envelope (|update| <= lr
        # per step; random-label gradients are near zero so the envelope is
        # the budget — a real placement/data bug would blow straight past it)
        np.testing.assert_allclose(
            w0["params"], flat_params(state), atol=3 * 2.1e-3
        )


@pytest.mark.slow
class TestDistributedTrainCLI:
    def test_full_train_cli_two_processes(self, tmp_path):
        """The COMPLETE training CLI across 2 processes on synthetic scenes:
        scene-shard loading, global-batch assembly, FUSED (K=2 lax.scan)
        shard_map dp steps, padded distributed validation with cross-process
        voxel-metric aggregation, coordinator-only checkpoint/log writes.
        16 scenes / 2 procs / local batch 4 -> 2 steps/epoch = one full
        fused group, so the production dispatch path (fused_steps > 1) runs
        cross-process, not just the per-batch fallback."""
        coord = f"127.0.0.1:{free_port()}"
        out_roots = [tmp_path / f"out{p}" for p in range(2)]
        common = [
            "--synthetic", "--synthetic_scenes", "16", "--batch_size", "8",
            "--epoch", "2", "--npoints", "1024", "--verbose", "1",
            "--fused_steps", "2", "--dist_coordinator", coord,
            "--dist_nprocs", "2",
        ]
        procs = [
            launch(
                "scripts/train.py",
                common + ["--dist_pid", str(p), "--output_root", str(out_roots[p])],
            )
            for p in range(2)
        ]
        (out0, _), (out1, _) = join_all(procs, timeout=1200)

        assert "parallel strategy: shard_map_dp (mesh size 8, processes 2)" in out0
        assert "best:" in out0
        # write gating: ONLY the coordinator produced a run directory
        runs0 = list(out_roots[0].iterdir())
        assert len(runs0) == 1, runs0
        assert not out_roots[1].exists() or not list(out_roots[1].iterdir())
        run = runs0[0]
        for f in ("config.json", "info.json", "model_last.msgpack",
                  "model_last.meta.json", "best.txt"):
            assert (run / f).exists(), f"missing {f} in {list(run.iterdir())}"
        scalars = json.loads(
            (run / "tensorboard" / "all_scalars.json").read_text()
        )
        for tag in ("train/loss", "val/loss", "val/voxel_miou"):
            vals = [v for _, v in scalars[tag]]
            assert len(vals) == 2, (tag, scalars[tag])  # one point per epoch
            assert all(np.isfinite(v) for v in vals), (tag, vals)
        # the non-coordinator stayed silent on per-iter reports
        assert "epoch [1/2]" not in out1

        # distributed RESUME: every process restores from the COORDINATOR's
        # run dir (shared filesystem) and re-replicates onto the global mesh
        coord2 = f"127.0.0.1:{free_port()}"
        procs = [
            launch(
                "scripts/train.py",
                ["--resume", str(run), "--synthetic", "--epoch", "3",
                 "--dist_coordinator", coord2, "--dist_nprocs", "2",
                 "--dist_pid", str(p)],
            )
            for p in range(2)
        ]
        (rout0, _), _ = join_all(procs, timeout=1200)
        assert "(from epoch 2)" in rout0, rout0[-2000:]
        meta = json.loads((run / "model_last.meta.json").read_text())
        assert meta["epoch"] == 2  # epochs 0,1 trained above, epoch 2 resumed
        scalars = json.loads(
            (run / "tensorboard" / "all_scalars.json").read_text()
        )
        # the resumed epoch logged at its true global epoch index
        assert any(step == 2 for step, _ in scalars["train/loss"]), scalars


@pytest.mark.slow
class TestDistributedEvalCLI:
    def test_distributed_eval_matches_single_process(self, tmp_path):
        """Multi-host whole-scene eval: scenes shard RAGGED across processes
        (3 scenes -> 2+1, every scene covered), each process evaluates
        independently, per-scene results merge via allgather_ragged — and
        the merged report equals the single-process report on the same
        scenes (the forward is deterministic; only float summation order in
        the final masked means can differ)."""
        # a checkpoint to evaluate: 0-epoch run = saved random init, no
        # train-step compile
        p = launch(
            "scripts/train.py",
            ["--synthetic", "--synthetic_scenes", "2", "--batch_size", "2",
             "--epoch", "0", "--npoints", "1024",
             "--output_root", str(tmp_path / "run")],
            local_devices=1,
        )
        join_all([p], timeout=600)
        run = next((tmp_path / "run").iterdir())

        eval_common = [
            "--folder", str(run), "--checkpoint", "model_last",
            "--synthetic", "--synthetic_scenes", "3", "--batch_size", "8",
        ]
        # single-process reference report
        p = launch("scripts/eval.py", list(eval_common), local_devices=4)
        (sout, _), = join_all([p], timeout=900)

        coord = f"127.0.0.1:{free_port()}"
        procs = [
            launch(
                "scripts/eval.py",
                eval_common + ["--dist_coordinator", coord,
                               "--dist_nprocs", "2", "--dist_pid", str(q)],
            )
            for q in range(2)
        ]
        (dout0, _), (dout1, _) = join_all(procs, timeout=900)

        def headline(text):
            out = {}
            for line in text.splitlines():
                for key in ("Point accuracy:", "Voxel accuracy:",
                            "Point mIoU:", "Voxel mIoU:",
                            "Calibrated voxel accuracy:"):
                    if line.startswith(key):
                        out[key] = float(line.split(":")[1])
            return out

        ref, dist = headline(sout), headline(dout0)
        assert set(ref) == set(dist) and len(ref) == 5, (ref, dist)
        for k in ref:
            np.testing.assert_allclose(dist[k], ref[k], rtol=1e-6, err_msg=k)
        assert "Voxel mIoU" not in dout1  # coordinator-only report
        # each process printed progress for ITS scenes (2 + 1 split)
        assert dout0.count("point_acc") >= 2 and dout1.count("point_acc") >= 1


@pytest.mark.slow
class TestDistributedShapeTrainers:
    """The beyond-reference shape families scale with the same multi-host
    pattern: per-process train batch shards (pid-folded seeds), a GLOBAL
    fixed val set row-sliced per process, coordinator-gated writes."""

    def test_cls_trainer_two_processes(self, tmp_path):
        coord = f"127.0.0.1:{free_port()}"
        roots = [tmp_path / f"cls{p}" for p in range(2)]
        common = [
            "--epoch", "1", "--batch_size", "8", "--npoints", "1024",
            "--train_batches", "2", "--val_batches", "1", "--classes", "4",
            "--verbose", "1", "--dist_coordinator", coord, "--dist_nprocs", "2",
        ]
        procs = [
            launch(
                "scripts/train_cls.py",
                common + ["--dist_pid", str(p), "--output_root", str(roots[p])],
            )
            for p in range(2)
        ]
        (out0, _), (out1, _) = join_all(procs, timeout=1200)
        assert "shard_map dp=8 x 2 processes" in out0
        assert "best val acc:" in out0 and "best val acc:" not in out1
        runs = list(roots[0].iterdir())
        assert len(runs) == 1
        assert not roots[1].exists() or not list(roots[1].iterdir())
        scalars = json.loads((runs[0] / "all_scalars.json").read_text())
        assert len(scalars) == 1 and np.isfinite(scalars[0]["val_acc"])

    def test_partseg_trainer_two_processes(self, tmp_path):
        coord = f"127.0.0.1:{free_port()}"
        roots = [tmp_path / f"ps{p}" for p in range(2)]
        common = [
            "--epoch", "1", "--batch_size", "8", "--npoints", "1024",
            "--train_batches", "2", "--val_batches", "1", "--categories", "2",
            "--dist_coordinator", coord, "--dist_nprocs", "2",
        ]
        procs = [
            launch(
                "scripts/train_partseg.py",
                common + ["--dist_pid", str(p), "--output_root", str(roots[p])],
            )
            for p in range(2)
        ]
        (out0, _), (out1, _) = join_all(procs, timeout=1200)
        assert "shard_map dp=8 x 2 processes" in out0
        assert "best val part mIoU:" in out0
        runs = list(roots[0].iterdir())
        assert len(runs) == 1
        scalars = json.loads((runs[0] / "all_scalars.json").read_text())
        # ins/cat mIoU come from the gathered full-batch preds (all_rows)
        assert np.isfinite(scalars[0]["val_ins_miou"])
        assert np.isfinite(scalars[0]["val_cat_miou"])


class TestProcessContextUnit:
    """Single-process identity semantics + shard math (no subprocesses)."""

    def test_shard_list_striding_and_truncation(self):
        from pointnet2_scannet_tpu.parallel import ProcessContext

        items = list(range(7))
        shards = [ProcessContext(p, 3).shard_list(items) for p in range(3)]
        assert shards == [[0, 3], [1, 4], [2, 5]]  # 7 -> 2 each, item 6 dropped
        assert ProcessContext.single().shard_list(items) == items

    def test_single_process_identities(self):
        import jax
        from pointnet2_scannet_tpu.parallel import ProcessContext, make_mesh

        ctx = ProcessContext.single()
        mesh = make_mesh(8)
        batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
        placed = ctx.place(batch, mesh)
        np.testing.assert_array_equal(ctx.local_rows(placed["x"]), batch["x"])
        np.testing.assert_array_equal(ctx.all_rows(placed["x"]), batch["x"])
        # placement actually sharded rows over the mesh
        assert len(placed["x"].sharding.device_set) == 8
        g = ctx.place_from_global(batch, mesh)
        np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
        v = np.array([1.0, 2.0])
        np.testing.assert_array_equal(ctx.sum_across_processes(v), v)
        rows = np.ones((3, 4))
        np.testing.assert_array_equal(ctx.allgather_ragged(rows), rows)
        ctx.assert_uniform(5, "steps")  # no-op
        ctx.barrier("noop")

    def test_pack_unpack_scene_results_roundtrip(self):
        from pointnet2_scannet_tpu.engine.evaluator import (
            SceneResult,
            pack_scene_results,
            unpack_scene_results,
        )

        rng = np.random.default_rng(0)
        C = 20
        results = [
            SceneResult(
                scene_id=f"s{i}",
                point_acc=float(rng.uniform()),
                point_acc_per_class=rng.uniform(size=C),
                voxel_acc=float(rng.uniform()),
                voxel_acc_per_class=rng.uniform(size=C),
                voxel_cali_acc=float(rng.uniform()),
                point_miou=rng.uniform(size=C),
                voxel_miou=rng.uniform(size=C),
                acc_mask=(rng.uniform(size=C) > 0.5).astype(np.float64),
                miou_mask=(rng.uniform(size=C) > 0.5).astype(np.float64),
            )
            for i in range(3)
        ]
        back = unpack_scene_results(pack_scene_results(results))
        for a, b in zip(results, back):
            for f in ("point_acc", "voxel_acc", "voxel_cali_acc"):
                assert getattr(a, f) == getattr(b, f)
            for f in ("point_acc_per_class", "voxel_acc_per_class",
                      "point_miou", "voxel_miou", "acc_mask", "miou_mask"):
                np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
        assert unpack_scene_results(pack_scene_results([])) == []


@pytest.mark.slow
class TestDistributedVisualizeCLI:
    def test_two_process_visualize_covers_empty_shard(self, tmp_path):
        """Distributed visualize: 1 synthetic scene over 2 processes —
        process 0 writes the PLY, process 1 has an EMPTY shard and must
        still exit cleanly through the end barrier (the empty-shard path is
        exactly what a pod run with scenes % hosts != 0 hits)."""
        p = launch(
            "scripts/train.py",
            ["--synthetic", "--synthetic_scenes", "2", "--batch_size", "2",
             "--epoch", "0", "--npoints", "1024",
             "--output_root", str(tmp_path / "run")],
            local_devices=1,
        )
        join_all([p], timeout=600)
        run = next((tmp_path / "run").iterdir())

        coord = f"127.0.0.1:{free_port()}"
        procs = [
            launch(
                "scripts/visualize.py",
                ["--folder", str(run), "--checkpoint", "model_last",
                 "--synthetic", "--batch_size", "8",
                 "--dist_coordinator", coord, "--dist_nprocs", "2",
                 "--dist_pid", str(q)],
            )
            for q in range(2)
        ]
        (out0, _), (out1, _) = join_all(procs, timeout=900)
        plys = list((run / "preds").glob("*.ply"))
        assert len(plys) == 1, plys
        assert "wrote" in out0 and "wrote" not in out1
