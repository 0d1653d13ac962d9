"""Randomized-shape contract sweep for the geometry ops.

The fixed-shape tests in test_ops.py pin the documented contracts at the
model's production shapes; this sweep drives the SAME oracles
(tests/oracles.py — the CUDA kernel contracts) across randomized, mostly
lane-UNALIGNED shapes so the auto-gates' XLA fallback paths and their
pad/tie-break semantics are exercised where the Pallas kernels can't engage.
Gradients are checked against the dense re-derivation where the op is
differentiable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnet2_scannet_tpu.ops import (
    ball_query,
    furthest_point_sample,
    gather_points,
    group_points,
    three_interpolate,
    three_nn,
)
from tests import oracles

N_CASES = 12


def _cases(seed: int):
    rng = np.random.default_rng(seed)
    for i in range(N_CASES):
        B = int(rng.integers(1, 4))
        N = int(rng.integers(8, 300))
        M = int(rng.integers(1, min(N, 96) + 1))
        K = int(rng.integers(1, 20))
        yield i, rng, B, N, M, K


class TestFuzzBallQuery:
    def test_random_shapes_match_oracle(self):
        for i, rng, B, N, M, K in _cases(100):
            xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
            q = xyz[:, rng.permutation(N)[:M]]
            radius = float(rng.uniform(0.05, 0.6))
            got = np.asarray(ball_query(radius, K, jnp.asarray(xyz), jnp.asarray(q)))
            want = oracles.ball_query_fast(radius, K, xyz, q)
            np.testing.assert_array_equal(got, want, err_msg=f"case {i}")


class TestFuzzFPS:
    def test_random_shapes_match_oracle(self):
        for i, rng, B, N, M, _ in _cases(200):
            xyz = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
            got = np.asarray(furthest_point_sample(jnp.asarray(xyz), M))
            want = oracles.fps_fast(xyz, M)
            np.testing.assert_array_equal(got, want, err_msg=f"case {i}")

    def test_near_origin_skip_random(self):
        rng = np.random.default_rng(7)
        xyz = rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32)
        xyz[:, ::5] *= 0.001  # plant near-origin points
        got = np.asarray(furthest_point_sample(jnp.asarray(xyz), 16))
        want = oracles.fps_fast(xyz, 16)
        np.testing.assert_array_equal(got, want)


class TestFuzzThreeNN:
    def test_random_shapes_match_oracle(self):
        for i, rng, B, N, M, _ in _cases(300):
            m = max(M, 3)
            unknown = rng.uniform(-1, 1, (B, N, 3)).astype(np.float32)
            known = rng.uniform(-1, 1, (B, m, 3)).astype(np.float32)
            d2, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
            want_d2, want_idx = oracles.three_nn_fast(unknown, known)
            np.testing.assert_array_equal(np.asarray(idx), want_idx, err_msg=f"case {i}")
            np.testing.assert_allclose(
                np.asarray(d2), want_d2, rtol=1e-5, atol=1e-6, err_msg=f"case {i}"
            )

    def test_duplicate_points_tie_break(self):
        # identical known points: strict-< insertion keeps the LOWEST index
        rng = np.random.default_rng(8)
        unknown = rng.uniform(-1, 1, (2, 37, 3)).astype(np.float32)
        base = rng.uniform(-1, 1, (2, 11, 3)).astype(np.float32)
        known = np.concatenate([base, base[:, :5]], axis=1)  # dup rows
        _, idx = three_nn(jnp.asarray(unknown), jnp.asarray(known))
        _, want_idx = oracles.three_nn_fast(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)


class TestFuzzGrouping:
    def test_group_points_values_and_grad(self):
        for i, rng, B, N, M, K in _cases(400):
            C = int(rng.integers(1, 12))
            pts = rng.normal(size=(B, N, C)).astype(np.float32)
            idx = rng.integers(0, N, (B, M, K)).astype(np.int32)
            got = np.asarray(group_points(jnp.asarray(pts), jnp.asarray(idx)))
            want = oracles.group_points_oracle_fast(pts, idx)
            np.testing.assert_array_equal(got, want, err_msg=f"case {i}")
            # deterministic scatter-add backward == dense one-hot transpose
            cot = rng.normal(size=got.shape).astype(np.float32)

            def f(p, idx=jnp.asarray(idx)):
                return jnp.sum(group_points(p, idx) * jnp.asarray(cot))

            grad = np.asarray(jax.grad(f)(jnp.asarray(pts)))
            onehot = np.zeros((B, M * K, N), np.float32)
            flat = idx.reshape(B, M * K)
            for b in range(B):
                onehot[b, np.arange(M * K), flat[b]] = 1.0
            want_grad = np.einsum(
                "bjn,bjc->bnc", onehot, cot.reshape(B, M * K, C)
            )
            np.testing.assert_allclose(
                grad, want_grad, rtol=1e-5, atol=1e-5, err_msg=f"case {i}"
            )

    def test_gather_points_random(self):
        for i, rng, B, N, M, _ in _cases(500):
            C = int(rng.integers(1, 12))
            pts = rng.normal(size=(B, N, C)).astype(np.float32)
            idx = rng.integers(0, N, (B, M)).astype(np.int32)
            got = np.asarray(gather_points(jnp.asarray(pts), jnp.asarray(idx)))
            want = np.take_along_axis(pts, idx[..., None].astype(np.int64), axis=1)
            np.testing.assert_array_equal(got, want, err_msg=f"case {i}")


class TestFuzzInterpolate:
    def test_values_and_grads(self):
        for i, rng, B, N, M, _ in _cases(600):
            m = max(M, 3)
            C = int(rng.integers(1, 12))
            pts = rng.normal(size=(B, m, C)).astype(np.float32)
            idx = rng.integers(0, m, (B, N, 3)).astype(np.int32)
            w = rng.uniform(0, 1, (B, N, 3)).astype(np.float32)
            w /= w.sum(-1, keepdims=True)
            got = np.asarray(
                three_interpolate(jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(w))
            )
            want = oracles.three_interpolate_oracle_fast(pts, idx, w)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6, err_msg=f"case {i}")
            cot = rng.normal(size=got.shape).astype(np.float32)

            def f(p, idx=jnp.asarray(idx), w=jnp.asarray(w)):
                return jnp.sum(three_interpolate(p, idx, w) * jnp.asarray(cot))

            grad = np.asarray(jax.grad(f)(jnp.asarray(pts)))
            want_grad = np.zeros_like(pts)
            for b in range(B):
                for n in range(N):
                    for k in range(3):
                        want_grad[b, idx[b, n, k]] += w[b, n, k] * cot[b, n]
            np.testing.assert_allclose(
                grad, want_grad, rtol=1e-4, atol=1e-5, err_msg=f"case {i}"
            )
