"""Parity tests for the point-cloud primitive ops against the CUDA-contract
oracles (tests/oracles.py), plus gradient checks for the differentiable ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu import ops
from tests import oracles

RNG = np.random.default_rng(0)


def rand_cloud(b, n, lo=0.0, hi=1.5):
    return RNG.uniform(lo, hi, size=(b, n, 3)).astype(np.float32)


class TestFurthestPointSample:
    def test_matches_oracle(self):
        xyz = rand_cloud(2, 64)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
        want = oracles.fps_oracle(xyz, 16)
        np.testing.assert_array_equal(got, want)

    def test_near_origin_skip(self):
        xyz = rand_cloud(1, 32, lo=0.5, hi=1.5)
        # plant a far-away point inside the origin ball: it must never win
        xyz[0, 7] = [0.01, 0.01, 0.01]
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 8))
        want = oracles.fps_oracle(xyz, 8)
        np.testing.assert_array_equal(got, want)
        assert 7 not in got[0]

    def test_no_skip_flag(self):
        xyz = rand_cloud(1, 32)
        xyz[0, 3] = [0.0, 0.0, 0.0]
        got = np.asarray(
            ops.furthest_point_sample(jnp.asarray(xyz), 8, skip_near_origin=False)
        )
        want = oracles.fps_oracle(xyz, 8, skip_near_origin=False)
        np.testing.assert_array_equal(got, want)

    def test_seeds_index_zero(self):
        xyz = rand_cloud(3, 128)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 32))
        assert (got[:, 0] == 0).all()

    def test_unique_when_enough_points(self):
        xyz = rand_cloud(2, 256)
        got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 64))
        for b in range(2):
            assert len(set(got[b].tolist())) == 64


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.3, 8), (0.1, 4), (2.0, 16)])
    def test_matches_oracle(self, radius, nsample):
        xyz = rand_cloud(2, 96)
        new_xyz = xyz[:, :24].copy()
        got = np.asarray(
            ops.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz))
        )
        want = oracles.ball_query_oracle(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_is_all_zero(self):
        xyz = rand_cloud(1, 32, lo=10.0, hi=11.0)
        new_xyz = np.zeros((1, 4, 3), np.float32)
        got = np.asarray(ops.ball_query(0.5, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        assert (got == 0).all()

    def test_row_padded_with_first_hit(self):
        xyz = np.full((1, 16, 3), 100.0, np.float32)
        xyz[0, 5] = [0.0, 0.0, 0.0]  # the only in-radius point
        new_xyz = np.zeros((1, 1, 3), np.float32)
        got = np.asarray(ops.ball_query(0.5, 6, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        assert (got == 5).all()


class TestGrouping:
    def test_group_points_matches_oracle(self):
        points = RNG.normal(size=(2, 48, 7)).astype(np.float32)
        idx = RNG.integers(0, 48, size=(2, 12, 5)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(points), jnp.asarray(idx)))
        want = oracles.group_points_oracle(points, idx)
        np.testing.assert_array_equal(got, want)

    def test_gather_points(self):
        points = RNG.normal(size=(2, 48, 7)).astype(np.float32)
        idx = RNG.integers(0, 48, size=(2, 12)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(points), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, points[np.arange(2)[:, None], idx])

    def test_group_points_grad_is_scatter_add(self):
        points = RNG.normal(size=(1, 8, 3)).astype(np.float32)
        idx = np.array([[[0, 0, 2], [5, 5, 5]]], np.int32)

        def f(p):
            return jnp.sum(ops.group_points(p, jnp.asarray(idx)))

        g = np.asarray(jax.grad(f)(jnp.asarray(points)))
        want = np.zeros_like(points)
        for m in range(2):
            for k in range(3):
                want[0, idx[0, m, k]] += 1.0
        np.testing.assert_allclose(g, want)

    def test_query_and_group_centers_xyz(self):
        xyz = rand_cloud(2, 64)
        feats = RNG.normal(size=(2, 64, 5)).astype(np.float32)
        out = np.asarray(
            ops.query_and_group(0.4, 8, jnp.asarray(xyz), jnp.asarray(xyz[:, :16]), jnp.asarray(feats))
        )
        assert out.shape == (2, 16, 8, 8)
        idx = oracles.ball_query_oracle(0.4, 8, xyz, xyz[:, :16])
        want_xyz = oracles.group_points_oracle(xyz, idx) - xyz[:, :16][:, :, None, :]
        np.testing.assert_allclose(out[..., :3], want_xyz, atol=1e-6)
        np.testing.assert_allclose(
            out[..., 3:], oracles.group_points_oracle(feats, idx), atol=1e-6
        )

    def test_packed_bf16_group_matches_f32_path(self):
        from pointnet2_scannet_tpu.ops.neighborhood import group_with_idx

        xyz = rand_cloud(2, 64)
        feats = RNG.normal(size=(2, 64, 5)).astype(np.float32)
        q = xyz[:, :16]
        idx = oracles.ball_query_oracle(0.2, 8, xyz, q)
        want = np.asarray(
            group_with_idx(
                jnp.asarray(idx), jnp.asarray(xyz), jnp.asarray(q),
                jnp.asarray(feats),
            )
        )
        got = np.asarray(
            group_with_idx(
                jnp.asarray(idx), jnp.asarray(xyz), jnp.asarray(q),
                jnp.asarray(feats, jnp.bfloat16),
            ),
            np.float32,
        )
        # centered xyz keeps bf16 RELATIVE precision (reconstructed from the
        # 16-bit hi+lo split in f32, centered, THEN cast): abs error is
        # bounded by bf16 eps of the radius plus the 2^-16 split residue
        np.testing.assert_allclose(got[..., :3], want[..., :3], atol=2e-3)
        np.testing.assert_allclose(
            got[..., 3:], want[..., 3:].astype(jnp.bfloat16).astype(np.float32)
        )

    def test_packed_bf16_group_grads_flow(self):
        from pointnet2_scannet_tpu.ops.neighborhood import group_with_idx

        xyz = rand_cloud(1, 32)
        feats = RNG.normal(size=(1, 32, 4)).astype(np.float32)
        idx = oracles.ball_query_oracle(0.3, 4, xyz, xyz[:, :8])

        def f(x, ft):
            out = group_with_idx(
                jnp.asarray(idx), x, x[:, :8], ft.astype(jnp.bfloat16)
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gx, gf = jax.grad(f, argnums=(0, 1))(jnp.asarray(xyz), jnp.asarray(feats))
        assert np.isfinite(np.asarray(gx)).all() and np.asarray(gx).any()
        assert np.isfinite(np.asarray(gf)).all() and np.asarray(gf).any()
        # reference check: f32-path gradients at loose bf16 tolerance
        def f32ref(x, ft):
            out = group_with_idx(jnp.asarray(idx), x, x[:, :8], ft)
            return jnp.sum(out**2)

        gx2, gf2 = jax.grad(f32ref, argnums=(0, 1))(
            jnp.asarray(xyz), jnp.asarray(feats)
        )
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gf2), rtol=0.1, atol=0.05)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx2), rtol=0.1, atol=0.05)

    def test_group_all(self):
        xyz = rand_cloud(1, 16)
        feats = RNG.normal(size=(1, 16, 4)).astype(np.float32)
        out = np.asarray(ops.group_all(jnp.asarray(xyz), jnp.asarray(feats)))
        assert out.shape == (1, 1, 16, 7)
        np.testing.assert_array_equal(out[0, 0, :, :3], xyz[0])
        np.testing.assert_array_equal(out[0, 0, :, 3:], feats[0])


class TestInterpolate:
    def test_three_nn_matches_oracle(self):
        unknown = rand_cloud(2, 40)
        known = rand_cloud(2, 12)
        d2, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        want_d2, want_idx = oracles.three_nn_oracle(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_allclose(np.asarray(d2), want_d2, rtol=1e-5, atol=1e-6)

    def test_three_interpolate_matches_oracle(self):
        points = RNG.normal(size=(2, 12, 6)).astype(np.float32)
        idx = RNG.integers(0, 12, size=(2, 40, 3)).astype(np.int32)
        w = RNG.uniform(size=(2, 40, 3)).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        got = np.asarray(
            ops.three_interpolate(jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w))
        )
        want = oracles.three_interpolate_oracle(points, idx, w)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_three_interpolate_grad(self):
        # finite-difference check of d/dpoints, analog of the reference's only
        # numeric test (pointnet2_test.py:18-30, gradcheck on three_interpolate)
        points = RNG.normal(size=(1, 4, 2)).astype(np.float64)
        idx = RNG.integers(0, 4, size=(1, 6, 3)).astype(np.int32)
        w = RNG.uniform(size=(1, 6, 3))
        w /= w.sum(-1, keepdims=True)

        with jax.enable_x64(True):

            def f(p):
                return jnp.sum(
                    ops.three_interpolate(p, jnp.asarray(idx), jnp.asarray(w)) ** 2
                )

            g = np.asarray(jax.grad(f)(jnp.asarray(points)))
            eps = 1e-6
            for flat in range(points.size):
                b, m, c = np.unravel_index(flat, points.shape)
                p1, p2 = points.copy(), points.copy()
                p1[b, m, c] += eps
                p2[b, m, c] -= eps
                fd = (f(jnp.asarray(p1)) - f(jnp.asarray(p2))) / (2 * eps)
                np.testing.assert_allclose(g[b, m, c], fd, rtol=1e-4, atol=1e-6)


class TestJitAndVmap:
    def test_ops_jit_compile(self):
        xyz = jnp.asarray(rand_cloud(2, 64))
        feats = jnp.asarray(RNG.normal(size=(2, 64, 4)).astype(np.float32))

        @jax.jit
        def pipeline(xyz, feats):
            idx = ops.furthest_point_sample(xyz, 16)
            new_xyz = ops.gather_points(xyz, idx)
            g = ops.query_and_group(0.4, 8, xyz, new_xyz, feats)
            pooled = jnp.max(g, axis=2)
            d2, nn = ops.three_nn(xyz, new_xyz)
            d = jnp.sqrt(d2)
            w = (1.0 / (d + 1e-8))
            w = w / jnp.sum(w, -1, keepdims=True)
            return ops.three_interpolate(pooled, nn, w)

        out = pipeline(xyz, feats)
        assert out.shape == (2, 64, 7)
        assert np.isfinite(np.asarray(out)).all()


class TestUniformResample:
    def test_prefix_preserved_padding_resampled(self):
        from pointnet2_scannet_tpu.ops.neighborhood import (
            unique_neighbor_count,
            uniform_resample_neighbors,
        )

        idx = jnp.asarray([[[2, 5, 9, 2, 2], [0, 0, 0, 0, 0], [1, 3, 3, 3, 3]]])
        cnt = np.asarray(unique_neighbor_count(idx))
        np.testing.assert_array_equal(cnt, [[3, 1, 2]])
        out, cnt2 = uniform_resample_neighbors(jax.random.key(0), idx)
        out = np.asarray(out)
        np.testing.assert_array_equal(cnt2, cnt)
        # unique prefix untouched
        np.testing.assert_array_equal(out[0, 0, :3], [2, 5, 9])
        np.testing.assert_array_equal(out[0, 2, :2], [1, 3])
        # padding drawn from the unique set
        assert set(out[0, 0, 3:]) <= {2, 5, 9}
        assert set(out[0, 2, 2:]) <= {1, 3}
        np.testing.assert_array_equal(out[0, 1], 0)


class TestRandomDropout:
    def test_eval_identity_train_masks(self):
        from pointnet2_scannet_tpu.models.layers import RandomDropout

        x = jnp.ones((4, 64))
        mod = RandomDropout(p=0.9)
        v = mod.init({"params": jax.random.key(0), "dropout": jax.random.key(1)}, x)
        out_eval = mod.apply(v, x, deterministic=True)
        np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))
        out_train = mod.apply(
            v, x, deterministic=False, rngs={"dropout": jax.random.key(2)}
        )
        arr = np.asarray(out_train)
        # no rescaling: surviving values stay exactly 1.0
        assert set(np.unique(arr)) <= {0.0, 1.0}


class TestOpVariants:
    """The alternative lowerings must be semantically identical."""

    def test_three_interpolate_dense_matches(self):
        from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_dense

        points = RNG.normal(size=(2, 12, 6)).astype(np.float32)
        idx = RNG.integers(0, 12, size=(2, 40, 3)).astype(np.int32)
        w = RNG.uniform(size=(2, 40, 3)).astype(np.float32)
        a = np.asarray(ops.three_interpolate(jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w)))
        b = np.asarray(three_interpolate_dense(jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_three_interpolate_dense_grads_match(self):
        from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_dense

        points = jnp.asarray(RNG.normal(size=(1, 8, 4)).astype(np.float32))
        idx = jnp.asarray(RNG.integers(0, 8, size=(1, 10, 3)).astype(np.int32))
        w = jnp.asarray(RNG.uniform(size=(1, 10, 3)).astype(np.float32))
        g1 = jax.grad(lambda p: jnp.sum(ops.three_interpolate(p, idx, w) ** 2))(points)
        g2 = jax.grad(lambda p: jnp.sum(three_interpolate_dense(p, idx, w) ** 2))(points)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)

    def test_three_interpolate_cached_matches(self):
        # cached-W custom_vjp: same values as the plain op, grads to
        # FEATURES ONLY (the reference ThreeInterpolate.backward contract),
        # and the feature grad equals the dense path's
        from pointnet2_scannet_tpu.ops.interpolate import (
            three_interpolate_cached,
            three_interpolate_dense,
        )

        points = jnp.asarray(RNG.normal(size=(2, 12, 6)).astype(np.float32))
        idx = jnp.asarray(RNG.integers(0, 12, size=(2, 40, 3)).astype(np.int32))
        w = jnp.asarray(RNG.uniform(size=(2, 40, 3)).astype(np.float32))
        a = np.asarray(ops.three_interpolate(points, idx, w))
        b = np.asarray(three_interpolate_cached(points, idx, w))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
        g1 = jax.grad(lambda p: jnp.sum(three_interpolate_dense(p, idx, w) ** 2))(points)
        g2 = jax.grad(lambda p: jnp.sum(three_interpolate_cached(p, idx, w) ** 2))(points)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)
        gw = jax.grad(
            lambda ww: jnp.sum(three_interpolate_cached(points, idx, ww) ** 2)
        )(w)
        np.testing.assert_array_equal(np.asarray(gw), 0.0)  # weights: no grad

    def test_group_points_segsum_matches(self):
        from pointnet2_scannet_tpu.ops.neighborhood import group_points_segsum

        points = jnp.asarray(RNG.normal(size=(2, 30, 5)).astype(np.float32))
        idx = jnp.asarray(RNG.integers(0, 30, size=(2, 9, 4)).astype(np.int32))
        np.testing.assert_array_equal(
            np.asarray(ops.group_points(points, idx)),
            np.asarray(group_points_segsum(points, idx)),
        )
        g1 = jax.grad(lambda p: jnp.sum(ops.group_points(p, idx) ** 2))(points)
        g2 = jax.grad(lambda p: jnp.sum(group_points_segsum(p, idx) ** 2))(points)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


class TestThreeInterpolateFast:
    """three_interpolate_fast: reference-contract differentiability (grad to
    features only, pointnet2_utils.py:188-206) with gather fwd + dense bwd."""

    def test_value_and_feature_grad_match_plain(self):
        import jax

        from pointnet2_scannet_tpu.ops.interpolate import (
            three_interpolate,
            three_interpolate_fast,
        )

        rng = np.random.default_rng(11)
        pts = jnp.asarray(rng.normal(size=(2, 128, 16)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 128, (2, 256, 3)).astype(np.int32))
        w = jnp.asarray(rng.uniform(0.1, 1, (2, 256, 3)).astype(np.float32))
        w = w / jnp.sum(w, -1, keepdims=True)
        out = three_interpolate_fast(pts, idx, w)
        want = three_interpolate(pts, idx, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
        g1 = jax.grad(lambda p: jnp.sum(three_interpolate_fast(p, idx, w) ** 2))(pts)
        g2 = jax.grad(lambda p: jnp.sum(three_interpolate(p, idx, w) ** 2))(pts)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_weight_grad_is_zero_like_reference(self):
        import jax

        from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_fast

        rng = np.random.default_rng(12)
        pts = jnp.asarray(rng.normal(size=(1, 128, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 128, (1, 128, 3)).astype(np.int32))
        w = jnp.asarray(rng.uniform(0.1, 1, (1, 128, 3)).astype(np.float32))
        gw = jax.grad(
            lambda w_: jnp.sum(three_interpolate_fast(pts, idx, w_) ** 2)
        )(w)
        # the CUDA ThreeInterpolate.backward returns None for weight
        np.testing.assert_array_equal(np.asarray(gw), np.zeros_like(np.asarray(gw)))


def test_fp_module_interpolate_cached_flag_matches_default():
    """ops_config.interpolate_cached routes FeaturePropagation through the
    W-caching custom_vjp; outputs must equal the default lowering."""
    import jax

    from pointnet2_scannet_tpu.models.modules import FeaturePropagation
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    rng = np.random.default_rng(4)
    unk = jnp.asarray(rng.uniform(0, 1.5, (2, 64, 3)).astype(np.float32))
    kno = jnp.asarray(rng.uniform(0, 1.5, (2, 16, 3)).astype(np.float32))
    kfeat = jnp.asarray(rng.normal(size=(2, 16, 8)).astype(np.float32))
    fp = FeaturePropagation(mlp=(8,))
    variables = fp.init(jax.random.key(0), unk, kno, None, kfeat)
    base = np.asarray(fp.apply(variables, unk, kno, None, kfeat))
    ops_config.interpolate_cached = True
    try:
        got = np.asarray(fp.apply(variables, unk, kno, None, kfeat))
    finally:
        ops_config.interpolate_cached = False
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-6)


class TestFloat64Geometry:
    """f64 inputs keep f64 geometry (round 4).

    fps historically force-cast to f32 and ball_query compared against an
    f32-rounded radius^2 constant; both now preserve double precision so a
    full-f64 forward matches a double-precision reference bit-for-bit
    (tests/test_reference_eval_parity.py). f32 behavior is bit-identical
    (covered by every other test in this file)."""

    def _x64(self):
        import contextlib

        @contextlib.contextmanager
        def ctx():
            jax.config.update("jax_enable_x64", True)
            try:
                yield
            finally:
                jax.config.update("jax_enable_x64", False)

        return ctx()

    def test_fps_preserves_f64(self):
        xyz = rand_cloud(2, 64).astype(np.float64)
        with self._x64():
            got = np.asarray(ops.furthest_point_sample(jnp.asarray(xyz), 16))
        want = oracles.fps_oracle(xyz, 16)  # oracle math runs in f64
        np.testing.assert_array_equal(got, want)

    def test_ball_query_radius_constant_f64(self):
        # plant a point whose squared distance lies BETWEEN f64(r)^2 and
        # f32(r)*f32(r) (the f32-rounded square is ~3e-9 LARGER for r=0.3):
        # with the constant built in the distance dtype the f64 compare must
        # exclude it, matching a double-precision reference's r*r
        r = 0.3
        r2_64 = r * r
        r2_32 = float(np.float32(r) * np.float32(r))
        assert r2_32 > r2_64
        d2_mid = (r2_64 + r2_32) / 2
        xyz = np.zeros((1, 8, 3), np.float64)
        xyz[0, :, 0] = np.arange(8)  # spread the rest far away
        xyz[0, 3, 0] = np.sqrt(d2_mid)  # the boundary-band point
        new_xyz = np.zeros((1, 1, 3), np.float64)
        with self._x64():
            got = np.asarray(ops.ball_query(r, 4, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = oracles.ball_query_oracle(r, 4, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)
        assert 3 not in got[0, 0]  # the band point is OUTSIDE r*r in f64
