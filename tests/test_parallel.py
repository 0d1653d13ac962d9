"""Multi-device tests on the virtual 8-CPU-device mesh: the sharded train
step must compile, run, and agree with the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.engine import train_state as ts
from pointnet2_scannet_tpu.parallel import (
    batch_sharding,
    make_mesh,
    make_parallel_eval_step,
    make_parallel_train_step,
    replicated,
)

N = 1024
B = 8


def make_state_and_batch(seed=0):
    model = models.get_model(num_classes=20, is_msg=False, input_channels=0)
    rng = np.random.default_rng(seed)
    pc = rng.uniform(0, 1.5, size=(B, N, 3)).astype(np.float32)
    tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
    state = ts.create_train_state(model, jax.random.key(0), pc[:1], tx)
    batch = {
        "points": pc,
        "labels": rng.integers(0, 20, size=(B, N)).astype(np.int32),
        "weights": np.ones((B, N), np.float32),
    }
    return state, batch


class TestParallelStep:
    def test_eight_device_mesh_available(self):
        assert len(jax.devices()) >= 8

    def test_train_step_runs_on_mesh(self):
        mesh = make_mesh(8)
        state, batch = make_state_and_batch()
        state = jax.device_put(state, replicated(mesh))
        batch = jax.device_put(batch, batch_sharding(mesh))
        step = make_parallel_train_step(mesh, num_classes=20)
        key = jax.device_put(jax.random.key(1), replicated(mesh))
        new_state, stats = step(state, batch, key)
        assert np.isfinite(float(stats["loss"]))
        assert int(new_state.step) == 1
        cm = np.asarray(stats["confusion"])
        assert cm.sum() == B * N  # every point counted exactly once

    @pytest.mark.slow
    def test_dp_matches_single_device(self):
        # identical batch through an 8-way mesh and a 1-way mesh -> same loss
        state1, batch = make_state_and_batch(seed=3)
        results = {}
        for nd in (1, 8):
            mesh = make_mesh(nd)
            state = jax.device_put(state1, replicated(mesh))
            b = jax.device_put(batch, batch_sharding(mesh))
            step = make_parallel_train_step(mesh, num_classes=20, donate=False)
            key = jax.device_put(jax.random.key(1), replicated(mesh))
            new_state, stats = step(state, b, key)
            results[nd] = (
                float(stats["loss"]),
                np.asarray(stats["confusion"]),
                jax.tree_util.tree_leaves(new_state.params)[0],
            )
        np.testing.assert_allclose(results[1][0], results[8][0], rtol=2e-4)
        # confusion matrices: total counts identical; individual cells may
        # drift by a handful of points (sharded BatchNorm reduces in a
        # different order, and near-tie argmaxes flip under float jitter)
        assert results[1][1].sum() == results[8][1].sum() == B * N
        drift = np.abs(results[1][1] - results[8][1]).sum()
        assert drift <= B * N * 0.01, f"confusion drift {drift}"
        # params after one ADAM step: where a gradient is ~0, float jitter
        # flips the update's sign entirely (update = ±lr), so compare with a
        # tolerance of one full lr-sized step
        np.testing.assert_allclose(
            np.asarray(results[1][2]), np.asarray(results[8][2]), atol=2.5e-3
        )

    def test_eval_step_preds_sharded(self):
        mesh = make_mesh(8)
        state, batch = make_state_and_batch()
        state = jax.device_put(state, replicated(mesh))
        b = jax.device_put(batch, batch_sharding(mesh))
        estep = make_parallel_eval_step(mesh, num_classes=20)
        out = estep(state, b)
        assert out["preds"].shape == (B, N)
        assert np.asarray(out["confusion"]).sum() == B * N


class TestTensorParallel:
    @pytest.mark.slow
    def test_dp_tp_mesh_matches_dp_only(self):
        from pointnet2_scannet_tpu.parallel import (
            make_mesh_2d,
            make_sharded_train_step,
            shard_train_state,
        )

        state0, batch = make_state_and_batch(seed=7)
        results = {}
        for dp, tp in ((8, 1), (4, 2)):
            mesh = make_mesh_2d(dp, tp)
            state = shard_train_state(state0, mesh, tp_axis="tp")
            b = jax.device_put(batch, batch_sharding(mesh))
            key = jax.device_put(jax.random.key(1), replicated(mesh))
            step = make_sharded_train_step(num_classes=20, donate=False)
            new_state, stats = step(state, b, key)
            results[(dp, tp)] = (float(stats["loss"]), np.asarray(stats["confusion"]))
        np.testing.assert_allclose(
            results[(8, 1)][0], results[(4, 2)][0], rtol=2e-4
        )
        assert results[(4, 2)][1].sum() == B * N

    def test_tp_actually_shards_kernels(self):
        from pointnet2_scannet_tpu.parallel import make_mesh_2d, shard_train_state

        state0, _ = make_state_and_batch(seed=7)
        mesh = make_mesh_2d(2, 4)
        state = shard_train_state(state0, mesh, tp_axis="tp")
        # find a 2-D Dense kernel and check its sharding spec uses 'tp'
        leaves = jax.tree_util.tree_leaves_with_path(state.params)
        found = False
        for path, leaf in leaves:
            if leaf.ndim == 2 and leaf.shape[1] % 4 == 0:
                spec = leaf.sharding.spec
                assert spec == jax.sharding.PartitionSpec(None, "tp"), (path, spec)
                found = True
        assert found


class TestShardMapStep:
    """make_shardmap_train_step: per-device tracing (the multi-chip path for
    Pallas kernels, which GSPMD cannot partition) must agree with the GSPMD
    pjit step. Dropout is zeroed — the two paths draw masks differently by
    design (per-device fold_in vs one global pattern)."""

    def _spec(self):
        import dataclasses

        from pointnet2_scannet_tpu.models.pointnet2 import ssg_spec

        return dataclasses.replace(ssg_spec(20, 0), dropout=0.0)

    @pytest.mark.slow
    def test_matches_gspmd_step(self):
        import dataclasses

        from pointnet2_scannet_tpu.models.pointnet2 import PointNet2SemSeg
        from pointnet2_scannet_tpu.parallel.step import make_shardmap_train_step

        spec = self._spec()
        rng = np.random.default_rng(7)
        pc = rng.uniform(0, 1.5, size=(B, N, 3)).astype(np.float32)
        batch = {
            "points": pc,
            "labels": rng.integers(0, 20, size=(B, N)).astype(np.int32),
            "weights": np.ones((B, N), np.float32),
            "row_mask": np.ones((B,), np.float32),
        }
        tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
        results = {}
        for kind in ("gspmd", "shard_map"):
            mesh = make_mesh(8)
            model = PointNet2SemSeg(
                spec=spec, bn_axis_name="dp" if kind == "shard_map" else None
            )
            state = ts.create_train_state(model, jax.random.key(0), pc[:1], tx)
            state = jax.device_put(state, replicated(mesh))
            b = jax.device_put(batch, batch_sharding(mesh))
            key = jax.device_put(jax.random.key(1), replicated(mesh))
            if kind == "gspmd":
                step = make_parallel_train_step(mesh, num_classes=20, donate=False)
            else:
                step = make_shardmap_train_step(mesh, num_classes=20, donate=False)
            # TWO steps: a wrong (per-device-local, un-psum'd) gradient
            # would compound and blow well past the tolerances below
            new_state, stats = step(state, b, key)
            new_state, stats = step(new_state, b, key)
            results[kind] = (
                float(stats["loss"]),
                np.asarray(stats["confusion"]),
                np.asarray(jax.tree_util.tree_leaves(new_state.params)[0]),
                np.asarray(jax.tree_util.tree_leaves(new_state.batch_stats)[0]),
            )
        g, s = results["gspmd"], results["shard_map"]
        np.testing.assert_allclose(g[0], s[0], rtol=2e-4)
        assert g[1].sum() == s[1].sum() == B * N
        drift = np.abs(g[1] - s[1]).sum()
        assert drift <= B * N * 0.01, f"confusion drift {drift}"
        # with the gradient psum the two paths differ only by float
        # reduction order; Adam normalizes by grad scale (m/sqrt(v)), which
        # AMPLIFIES relative noise for near-zero grads — hence atol ~ a few
        # percent of the lr-sized update, far below the 2*lr a sign-flipped
        # (wrong-gradient) update would produce
        np.testing.assert_allclose(g[2], s[2], atol=2e-4)
        # BN batch stats: psum'd per-shard moments vs the global-batch
        # moments — same statistic, different reduction order
        np.testing.assert_allclose(g[3], s[3], rtol=1e-4, atol=1e-5)

    def test_row_mask_loss_matches_unsharded_formula(self):
        from pointnet2_scannet_tpu.engine.loss import (
            weighted_cross_entropy,
            weighted_cross_entropy_sharded,
        )
        from jax.sharding import PartitionSpec as P

        mesh = make_mesh(8)
        rng = np.random.default_rng(9)
        logits = rng.normal(size=(B, 64, 20)).astype(np.float32)
        labels = rng.integers(0, 20, (B, 64)).astype(np.int32)
        weights = rng.uniform(0.5, 2.0, (B, 64)).astype(np.float32)
        row_mask = np.array([1, 1, 1, 0, 1, 1, 0, 1], np.float32)
        want = float(
            weighted_cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights),
                jnp.asarray(row_mask),
            )
        )
        fn = jax.jit(
            jax.shard_map(
                lambda lo, la, w, m: weighted_cross_entropy_sharded(
                    lo, la, w, m, "dp"
                ),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                out_specs=P(),
                check_vma=False,
            )
        )
        got = float(fn(logits, labels, weights, row_mask))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_unmasked_sharded_loss_matches(self):
        from jax.sharding import PartitionSpec as P

        from pointnet2_scannet_tpu.engine.loss import (
            weighted_cross_entropy,
            weighted_cross_entropy_sharded,
        )

        mesh = make_mesh(8)
        rng = np.random.default_rng(10)
        logits = rng.normal(size=(B, 64, 20)).astype(np.float32)
        labels = rng.integers(0, 20, (B, 64)).astype(np.int32)
        weights = rng.uniform(0.5, 2.0, (B, 64)).astype(np.float32)
        want = float(
            weighted_cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
            )
        )
        fn = jax.jit(
            jax.shard_map(
                lambda lo, la, w: weighted_cross_entropy_sharded(
                    lo, la, w, None, "dp"
                ),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp")),
                out_specs=P(),
                check_vma=False,
            )
        )
        got = float(fn(logits, labels, weights))
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestFusedStep:
    """make_fused_train_step: a lax.scan of K steps must be the SAME math as
    K sequential per-batch steps (train_step folds the dropout key with
    state.step, so per-step keys line up)."""

    def _batches(self, k, seed=11):
        rng = np.random.default_rng(seed)
        out = []
        for _ in range(k):
            pc = rng.uniform(0, 1.5, size=(B, N, 3)).astype(np.float32)
            out.append(
                {
                    "points": pc,
                    "labels": rng.integers(0, 20, size=(B, N)).astype(np.int32),
                    "weights": np.ones((B, N), np.float32),
                }
            )
        return out

    @pytest.mark.slow
    def test_matches_sequential_single_device(self):
        from pointnet2_scannet_tpu.parallel import make_fused_train_step

        K = 3
        batches = self._batches(K)
        state, _ = make_state_and_batch(seed=5)
        mesh = make_mesh(1)
        key = jax.random.key(1)

        seq = make_parallel_train_step(mesh, num_classes=20, donate=False)
        st = state
        seq_losses = []
        for b in batches:
            st, stats = seq(st, jax.device_put(b), key)
            seq_losses.append(float(stats["loss"]))

        fused = make_fused_train_step(mesh, num_classes=20, donate=False)
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        fst, fstats = fused(state, jax.device_put(stacked), key)

        np.testing.assert_allclose(
            np.asarray(fstats["loss"]), np.asarray(seq_losses), rtol=1e-5
        )
        assert int(fst.step) == int(st.step) == K
        for a, b in zip(
            jax.tree_util.tree_leaves(st.params),
            jax.tree_util.tree_leaves(fst.params),
        ):
            # identical op sequence; only compilation differences (fusion
            # order) separate the two — far below one lr-sized Adam update
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(st.batch_stats),
            jax.tree_util.tree_leaves(fst.batch_stats),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_matches_sequential_shardmap(self):
        import dataclasses

        from pointnet2_scannet_tpu.models.pointnet2 import PointNet2SemSeg, ssg_spec
        from pointnet2_scannet_tpu.parallel import (
            fused_batch_sharding,
            make_fused_train_step,
        )
        from pointnet2_scannet_tpu.parallel.step import make_shardmap_train_step

        K = 2
        batches = self._batches(K, seed=13)
        for b in batches:
            b["row_mask"] = np.ones((B,), np.float32)
        mesh = make_mesh(8)
        spec = dataclasses.replace(ssg_spec(20, 0), dropout=0.0)
        model = PointNet2SemSeg(spec=spec, bn_axis_name="dp")
        tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
        state = ts.create_train_state(
            model, jax.random.key(0), batches[0]["points"][:1], tx
        )
        state = jax.device_put(state, replicated(mesh))
        key = jax.device_put(jax.random.key(1), replicated(mesh))

        seq = make_shardmap_train_step(mesh, num_classes=20, donate=False)
        st = state
        seq_losses = []
        for b in batches:
            st, stats = seq(st, jax.device_put(b, batch_sharding(mesh)), key)
            seq_losses.append(float(stats["loss"]))

        fused = make_fused_train_step(
            mesh, num_classes=20, axis_name="dp", donate=False
        )
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        fst, fstats = fused(
            state, jax.device_put(stacked, fused_batch_sharding(mesh)), key
        )

        np.testing.assert_allclose(
            np.asarray(fstats["loss"]), np.asarray(seq_losses), rtol=1e-5
        )
        assert int(fst.step) == K
        for a, b in zip(
            jax.tree_util.tree_leaves(st.params),
            jax.tree_util.tree_leaves(fst.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
