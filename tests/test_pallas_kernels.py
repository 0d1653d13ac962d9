"""Pallas kernel parity tests, run in interpreter mode on the CPU backend
(real-TPU execution is exercised by scripts/profile_ops.py and the bench)."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_scannet_tpu.ops.pallas.fps_kernel import furthest_point_sample_pallas
from pointnet2_scannet_tpu.ops.sampling import furthest_point_sample
from tests import oracles

RNG = np.random.default_rng(5)


class TestFpsPallas:
    def test_matches_xla_and_oracle(self):
        xyz = RNG.uniform(0, 1.5, size=(4, 256, 3)).astype(np.float32)
        got = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(xyz), 64, interpret=True)
        )
        want_xla = np.asarray(
            furthest_point_sample(jnp.asarray(xyz), 64, use_pallas=False)
        )
        want_oracle = oracles.fps_oracle(xyz, 64)
        np.testing.assert_array_equal(got, want_xla)
        np.testing.assert_array_equal(got, want_oracle)

    def test_near_origin_skip(self):
        xyz = RNG.uniform(0.5, 1.5, size=(2, 128, 3)).astype(np.float32)
        xyz[0, 5] = [0.01, 0.0, 0.01]
        got = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(xyz), 32, interpret=True)
        )
        np.testing.assert_array_equal(got, oracles.fps_oracle(xyz, 32))
        assert 5 not in got[0]

    def test_non_multiple_of_128_npoint(self):
        xyz = RNG.uniform(0, 1.5, size=(2, 200, 3)).astype(np.float32)
        got = np.asarray(
            furthest_point_sample_pallas(jnp.asarray(xyz), 16, interpret=True)
        )
        np.testing.assert_array_equal(got, oracles.fps_oracle(xyz, 16))


class TestBallQueryPallas:
    def test_matches_oracle_interpret(self):
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            ball_query_pallas,
        )

        xyz = RNG.uniform(0, 1.5, size=(2, 256, 3)).astype(np.float32)
        q = xyz[:, :64].copy()
        got = np.asarray(
            ball_query_pallas(0.3, 16, jnp.asarray(xyz), jnp.asarray(q), interpret=True)
        )
        want = oracles.ball_query_oracle(0.3, 16, xyz, q)
        np.testing.assert_array_equal(got, want)

    def test_auto_tile_shrinks_for_large_n(self):
        # large point clouds must shrink the (TM, N) query tile to stay in
        # the VMEM envelope; halving preserves divisibility of M
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            _auto_tile_m,
        )

        assert _auto_tile_m(1024, 8192) == 128
        assert _auto_tile_m(1024, 16384) == 64
        assert _auto_tile_m(1024, 32768) == 32
        assert _auto_tile_m(64, 8192) == 64
        for M, N in [(1024, 16384), (96, 32768), (128, 131072)]:
            tm = _auto_tile_m(M, N)
            assert M % tm == 0 and tm * N <= 128 * 8192, (M, N, tm)

    def test_large_n_tile_parity_interpret(self):
        # N big enough that the auto tile drops below min(M, 128)
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            _auto_tile_m,
            ball_query_pallas,
        )

        N = 16384
        assert _auto_tile_m(16, N) == 16  # M <= 128 keeps full tile...
        xyz = RNG.uniform(0, 1.5, size=(1, N, 3)).astype(np.float32)
        q = xyz[:, :128].copy()
        assert _auto_tile_m(128, N) == 64  # ...but M=128 halves once
        got = np.asarray(
            ball_query_pallas(0.3, 8, jnp.asarray(xyz), jnp.asarray(q), interpret=True)
        )
        want = oracles.ball_query_oracle(0.3, 8, xyz, q)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball_zeros(self):
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            ball_query_pallas,
        )

        far = np.full((1, 128, 3), 50.0, np.float32)
        q = np.zeros((1, 16, 3), np.float32)
        got = np.asarray(
            ball_query_pallas(0.5, 8, jnp.asarray(far), jnp.asarray(q), interpret=True)
        )
        assert (got == 0).all()

    def test_row_padded_with_first_hit(self):
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            ball_query_pallas,
        )

        xyz = np.full((1, 128, 3), 100.0, np.float32)
        xyz[0, 5] = [0.0, 0.0, 0.0]
        q = np.zeros((1, 8, 3), np.float32)
        got = np.asarray(
            ball_query_pallas(0.5, 6, jnp.asarray(xyz), jnp.asarray(q), interpret=True)
        )
        assert (got == 5).all()


class TestMxuGather:
    def _patched(self):
        from jax.experimental import pallas as pl

        import pointnet2_scannet_tpu.ops.pallas.gather_kernel as gk

        orig = pl.pallas_call
        gk.pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        return gk, orig

    def test_fwd_and_bwd_match_take_along_axis(self):
        gk, orig = self._patched()
        try:
            src = jnp.asarray(RNG.normal(size=(2, 256, 8)).astype(np.float32))
            idx = jnp.asarray(RNG.integers(0, 256, (2, 384)).astype(np.int32))
            out = gk.mxu_gather(src, idx)
            want = jnp.take_along_axis(src, idx[..., None], axis=1)
            np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
            g1 = jax.grad(lambda s: jnp.sum(gk.mxu_gather(s, idx) ** 2))(src)
            g2 = jax.grad(
                lambda s: jnp.sum(jnp.take_along_axis(s, idx[..., None], axis=1) ** 2)
            )(src)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
        finally:
            gk.pl.pallas_call = orig

    def test_split3_bf16_is_exact(self):
        from pointnet2_scannet_tpu.ops.pallas.gather_kernel import split3_bf16

        # adversarial values: full-mantissa randoms, tiny, huge, negatives
        x = np.concatenate(
            [
                RNG.normal(size=1024).astype(np.float32),
                RNG.uniform(-1e30, 1e30, 64).astype(np.float32),
                RNG.uniform(-1e-30, 1e-30, 64).astype(np.float32),
                np.float32([0.0, -0.0, 1.0, -1.0, np.pi, 2**-120]),
            ]
        )
        hi, mid, lo = split3_bf16(jnp.asarray(x))
        recon = (
            np.asarray(hi, np.float32)
            + np.asarray(mid, np.float32)
            + np.asarray(lo, np.float32)
        )
        np.testing.assert_array_equal(recon, x)

    def test_split_gather_fwd_bwd_match_take_along_axis(self):
        gk, orig = self._patched()
        try:
            src = jnp.asarray(RNG.normal(size=(2, 256, 8)).astype(np.float32))
            idx = jnp.asarray(RNG.integers(0, 256, (2, 384)).astype(np.int32))
            out = gk.mxu_gather_split(src, idx)
            want = jnp.take_along_axis(src, idx[..., None], axis=1)
            # the 3x bf16-pass gather must be BIT-exact on f32 values
            np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
            g1 = jax.grad(lambda s: jnp.sum(gk.mxu_gather_split(s, idx) ** 2))(src)
            g2 = jax.grad(
                lambda s: jnp.sum(jnp.take_along_axis(s, idx[..., None], axis=1) ** 2)
            )(src)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)
        finally:
            gk.pl.pallas_call = orig

    def test_supported_gating(self):
        import pointnet2_scannet_tpu.ops.pallas.gather_kernel as gk

        src = jnp.zeros((1, 8192, 6))
        assert gk.supported(src, 32768)
        assert not gk.supported(jnp.zeros((1, 100, 6)), 32768)  # N not aligned
        assert not gk.supported(src, 100)  # J not aligned


class TestBallQueryMultiPallas:
    def test_matches_single_radius_kernels(self):
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            ball_query_multi_pallas,
            ball_query_pallas,
        )

        xyz = RNG.uniform(0, 1.5, size=(2, 256, 3)).astype(np.float32)
        q = xyz[:, :64].copy()
        i1, i2 = ball_query_multi_pallas(
            (0.2, 0.4), (16, 32), jnp.asarray(xyz), jnp.asarray(q), interpret=True
        )
        w1 = ball_query_pallas(0.2, 16, jnp.asarray(xyz), jnp.asarray(q), interpret=True)
        w2 = ball_query_pallas(0.4, 32, jnp.asarray(xyz), jnp.asarray(q), interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(w1))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(w2))
        # and both equal the oracle
        np.testing.assert_array_equal(
            np.asarray(i1), oracles.ball_query_oracle(0.2, 16, xyz, q)
        )
        np.testing.assert_array_equal(
            np.asarray(i2), oracles.ball_query_oracle(0.4, 32, xyz, q)
        )


class TestVmemGather:
    """Chunk-select lane-gather kernel (ops/pallas/vmem_gather_kernel.py) —
    interpret-mode parity vs take_along_axis for values AND gradients."""

    def test_f32_fwd_bwd_match_take_along_axis(self):
        import jax

        from pointnet2_scannet_tpu.ops.pallas import vmem_gather_kernel as vk

        src = jnp.asarray(RNG.normal(size=(2, 384, 9)).astype(np.float32))
        idx = jnp.asarray(RNG.integers(0, 384, (2, 256)).astype(np.int32))
        out = vk.vmem_gather(src, idx, True)
        want = jnp.take_along_axis(src, idx[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
        g1 = jax.grad(lambda s: jnp.sum(vk.vmem_gather(s, idx, True) ** 2))(src)
        g2 = jax.grad(
            lambda s: jnp.sum(jnp.take_along_axis(s, idx[..., None], axis=1) ** 2)
        )(src)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)

    def test_bf16_pair_packed_gather(self):
        import jax

        from pointnet2_scannet_tpu.ops.pallas import vmem_gather_kernel as vk

        src = jnp.asarray(
            RNG.normal(size=(2, 256, 12)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(RNG.integers(0, 256, (2, 128)).astype(np.int32))
        out = vk.vmem_gather_any(src, idx, interpret=True)
        want = jnp.take_along_axis(src, idx[..., None], axis=1)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(want, np.float32)
        )
        g = jax.grad(
            lambda s: jnp.sum(
                vk.vmem_gather_any(s, idx, interpret=True).astype(jnp.float32) ** 2
            )
        )(src)
        g2 = jax.grad(
            lambda s: jnp.sum(
                jnp.take_along_axis(s, idx[..., None], axis=1).astype(jnp.float32)
                ** 2
            )
        )(src)
        np.testing.assert_allclose(
            np.asarray(g, np.float32), np.asarray(g2, np.float32), rtol=1e-2
        )

    def test_supported_gating(self):
        from pointnet2_scannet_tpu.ops.pallas import vmem_gather_kernel as vk

        assert vk.supported(jnp.zeros((1, 8192, 9)), 32768)
        assert vk.supported(jnp.zeros((1, 1024, 12), jnp.bfloat16), 8192)
        assert not vk.supported(jnp.zeros((1, 1024, 11), jnp.bfloat16), 8192)
        assert not vk.supported(jnp.zeros((1, 100, 9)), 32768)  # N unaligned
        assert not vk.supported(jnp.zeros((1, 8192, 9)), 100)  # J unaligned
        assert not vk.supported(jnp.zeros((1, 8192, 9), jnp.float16), 1024)


class TestThreeNNPallas:
    def test_matches_oracle_interpret(self):
        from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import three_nn_pallas

        rng = np.random.default_rng(7)
        unknown = rng.uniform(0, 1.5, size=(2, 512, 3)).astype(np.float32)
        known = rng.uniform(0, 1.5, size=(2, 128, 3)).astype(np.float32)
        d2, idx = three_nn_pallas(
            jnp.asarray(unknown), jnp.asarray(known), interpret=True
        )
        want_d2, want_idx = oracles.three_nn_oracle(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        # the kernel computes d^2 with the subtract-square form in f32 (the
        # CUDA kernel's arithmetic); the oracle accumulates in f64
        np.testing.assert_allclose(
            np.asarray(d2), want_d2.astype(np.float32), rtol=1e-6
        )

    def test_transposed_matches_oracle_interpret(self):
        from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import three_nn_pallas_t

        rng = np.random.default_rng(8)
        # m=64 exercises the relaxed constraint (m % 8, not % 128)
        for n, m in ((512, 128), (256, 64), (384, 1024)):
            unknown = rng.uniform(0, 1.5, size=(2, n, 3)).astype(np.float32)
            known = rng.uniform(0, 1.5, size=(2, m, 3)).astype(np.float32)
            d2, idx = three_nn_pallas_t(
                jnp.asarray(unknown), jnp.asarray(known), tile_n=128,
                interpret=True,
            )
            want_d2, want_idx = oracles.three_nn_oracle(unknown, known)
            np.testing.assert_array_equal(np.asarray(idx), want_idx)
            np.testing.assert_allclose(
                np.asarray(d2), want_d2.astype(np.float32), rtol=1e-6
            )

    def test_transposed_tie_break_lowest_index(self):
        from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import three_nn_pallas_t

        # duplicate known points force exact distance ties; strict-< insertion
        # (interpolate_gpu.cu:34-49) keeps the earliest index
        known = np.zeros((1, 16, 3), np.float32)
        known[0, :, 0] = [0.5, 0.5, 0.5, 2.0, 2.0, 3.0, 3.0, 3.0,
                          4.0, 4.0, 4.0, 4.0, 5.0, 5.0, 5.0, 5.0]
        unknown = np.zeros((1, 128, 3), np.float32)
        unknown[:, :, 0] = 0.6
        d2, idx = three_nn_pallas_t(
            jnp.asarray(unknown), jnp.asarray(known), interpret=True
        )
        np.testing.assert_array_equal(
            np.asarray(idx)[0, 0], np.array([0, 1, 2], np.int32)
        )


class TestMxuScatterAdd:
    def test_matches_xla_scatter_add(self):
        from jax.experimental import pallas as pl

        import pointnet2_scannet_tpu.ops.pallas.gather_kernel as gk

        orig = pl.pallas_call
        gk.pl.pallas_call = lambda *a, **k: orig(*a, interpret=True, **k)
        try:
            B, J, N, C = 2, 384, 256, 40
            g = jnp.asarray(RNG.normal(size=(B, J, C)).astype(np.float32))
            idx = jnp.asarray(RNG.integers(0, N, (B, J)).astype(np.int32))
            got = gk.mxu_scatter_add(idx, g, N)
            want = (
                jnp.zeros((B, N, C))
                .at[jnp.arange(B)[:, None], idx, :]
                .add(g)
            )
            # 3x-bf16 split: exact on f32 inputs up to summation order
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
            )
        finally:
            gk.pl.pallas_call = orig

    def test_envelope(self):
        import pointnet2_scannet_tpu.ops.pallas.gather_kernel as gk

        assert gk.scatter_supported(1024, 8192, 67)  # SA2
        assert gk.scatter_supported(256, 2048, 131)  # SA3
        assert not gk.scatter_supported(64, 512, 259)  # SA4: N unaligned
        assert not gk.scatter_supported(8192, 32768, 9)  # SA1: out of envelope
