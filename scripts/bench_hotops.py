"""Honest per-op timings for the train step's hot list, per SA/FP level.

Methodology (the only one that gives true numbers through the axon tunnel):
  - each op runs REPS times inside one jitted lax.scan (device-side loop),
  - every iteration depends on the previous one through a tiny scalar bleed
    (defeats loop-invariant code motion),
  - the FULL output is consumed by a reduction into the carry (defeats
    slice-pushdown DCE — consuming out[::997, 0] lets XLA gather 33 rows
    instead of a million and report a fantasy number),
  - only the final scalar is fetched (the tunnel moves ~100 MB/s; fetching a
    134 MB grouped tensor would measure the tunnel, not the op).

Shapes: the SSG model at B=32, N=8192 input — per level (N, M, K, C_in).
`--msg` benches the MSG shapes instead (fused dual-radius ball query vs 2x
single, both scales' gathers at MSG widths, the MSG FP interpolate stack).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPS = 20
B = 32

# (N, M, r, K, C_src) per SSG SA level; C_src = 3 + feature channels entering
# the level ([xyz | feats] fused gather): 9, 3+32... actually SSG mlp outputs
# 64/128/256/512 -> next level's C_src = 3 + that.
SA_LEVELS = [
    ("SA1", 8192, 1024, 0.1, 32, 9),
    ("SA2", 1024, 256, 0.2, 32, 67),
    ("SA3", 256, 64, 0.4, 32, 131),
    ("SA4", 64, 16, 0.8, 32, 259),
]
# FP levels: (n_unknown, m_known, C_known)
FP_LEVELS = [
    ("FP4", 64, 16, 512),
    ("FP3", 256, 64, 256),
    ("FP2", 1024, 256, 256),
    ("FP1", 8192, 1024, 128),
]

# MSG variants (--msg): per level (name, N, M, ((r1, K1), (r2, K2)), C_src);
# C_src = 3 + sum of both scales' last MLP widths from the level above
# (models/pointnet2.py msg_spec: 32+64, 128+128, 256+256 -> 99/259/515).
MSG_SA_LEVELS = [
    ("SA1", 8192, 1024, ((0.05, 16), (0.1, 32)), 9),
    ("SA2", 1024, 256, ((0.1, 16), (0.2, 32)), 99),
    ("SA3", 256, 64, ((0.2, 16), (0.4, 32)), 259),
    ("SA4", 64, 16, ((0.4, 16), (0.8, 32)), 515),
]
# MSG FP: interpolated C = SA4 concat (512+512) at FP4, then each fp_mlp's
# last width (512, 512, 256) flows down.
MSG_FP_LEVELS = [
    ("FP4", 64, 16, 1024),
    ("FP3", 256, 64, 512),
    ("FP2", 1024, 256, 512),
    ("FP1", 8192, 1024, 256),
]


def bench(name, make_body, *args, reps=REPS):
    """make_body(acc, *args) -> scalar; jit a scan of it and time."""
    import jax
    import jax.numpy as jnp

    def run(*args):
        def body(acc, _):
            return make_body(acc, *args), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return acc

    fn = jax.jit(run)
    try:
        float(np.asarray(fn(*args)))  # compile + settle
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:<56} {dt:9.3f} ms", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 - keep benching past one OOM
        print(f"{name:<56}   FAILED: {str(e)[:120]}", flush=True)
        return float("nan")


def main_msg():
    """MSG hot-op table: dual-radius fused ball query (the production path,
    models/modules.py:101-112) vs 2x single queries, both scales' gathers at
    the MSG channel widths, and the MSG FP interpolate stack. FPS and
    three_nn are geometry-only (identical shapes to SSG) — see the SSG table.
    """
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu import ops
    from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_dense
    from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
        ball_query_multi_pallas,
    )
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    print("=== MSG ball query: fused dual-radius vs 2x single ===")
    for name, N, M, scales, _ in MSG_SA_LEVELS:
        xyz = jnp.asarray(rng.uniform(0, 1.5, (B, N, 3)).astype(np.float32))
        q = xyz[:, :M]
        radii = tuple(r for r, _ in scales)
        ks = tuple(k for _, k in scales)

        # mirror the production gate (models/modules.py:98): fused needs
        # N%128==0 AND M%256==0 — SA3 (M=64) and SA4 (N=64) take 2x single
        aligned = N % 128 == 0 and M % 256 == 0
        if aligned:

            def dual(acc, xyz, q, radii=radii, ks=ks):
                i1, i2 = ball_query_multi_pallas(
                    radii, ks, xyz + acc * 1e-20, q
                )
                s = jnp.sum(i1) + jnp.sum(i2)
                return s.astype(jnp.float32) * 1e-20 + acc

            bench(
                f"{name} dual ball_query (N={N}, M={M}, K={ks})", dual, xyz, q
            )
        else:
            print(
                f"{name} dual ball_query: n/a (N={N}%128 or M={M}%256 "
                "unaligned; prod uses 2x single)"
            )

        def two_single(acc, xyz, q, radii=radii, ks=ks):
            s = jnp.int32(0)
            x = xyz + acc * 1e-20
            for r, k in zip(radii, ks):
                s = s + jnp.sum(ops.ball_query(float(r), int(k), x, q))
            return s.astype(jnp.float32) * 1e-20 + acc

        bench(f"{name} 2x single ball_query", two_single, xyz, q)

    print("=== MSG grouped gather fwd / bwd (auto path, both scales) ===")
    for name, N, M, scales, C in MSG_SA_LEVELS:
        src = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        for si, (_, K) in enumerate(scales):
            idx = jnp.asarray(
                rng.integers(0, N, (B, M, K)).astype(np.int32)
            )

            def fwd(acc, src, idx):
                out = ops.group_points(src + acc * 1e-20, idx)
                return jnp.sum(out) * 1e-20 + acc

            bench(f"{name}s{si} gather fwd (J={M * K}, N={N}, C={C})", fwd, src, idx)

            def bwd(acc, src, idx):
                def f(s):
                    return jnp.sum(ops.group_points(s, idx) ** 2)

                g = jax.grad(f)(src + acc * 1e-20)
                return jnp.sum(g) * 1e-20 + acc

            bench(f"{name}s{si} gather+scatter bwd", bwd, src, idx)

    print("=== MSG three_interpolate dense fwd/bwd ===")
    for name, n, m, C in MSG_FP_LEVELS:
        unk = jnp.asarray(rng.uniform(0, 1.5, (B, n, 3)).astype(np.float32))
        kno = jnp.asarray(rng.uniform(0, 1.5, (B, m, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(B, m, C)).astype(np.float32))
        d2, nn3 = jax.jit(ops.three_nn)(unk, kno)
        w = jnp.asarray(rng.uniform(0.1, 1, (B, n, 3)).astype(np.float32))
        w = w / jnp.sum(w, -1, keepdims=True)

        def interp(acc, feats, w, nn3=nn3):
            out = three_interpolate_dense(feats + acc * 1e-20, nn3, w)
            return jnp.sum(out) * 1e-20 + acc

        bench(f"{name} interp_dense fwd (n={n}, C={C})", interp, feats, w)

        def interp_bwd(acc, feats, w, nn3=nn3):
            def f(s):
                return jnp.sum(three_interpolate_dense(s, nn3, w) ** 2)

            g = jax.grad(f)(feats + acc * 1e-20)
            return jnp.sum(g) * 1e-20 + acc

        bench(f"{name} interp_dense bwd (n={n}, C={C})", interp_bwd, feats, w)


def main():
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu import ops
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    print("=== grouped gather (XLA take_along_axis) fwd / bwd ===")
    for name, N, M, _, K, C in SA_LEVELS:
        src = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, (B, M * K, 1)).astype(np.int32))

        def fwd(acc, src, idx):
            out = jnp.take_along_axis(src + acc * 1e-20, idx, axis=1)
            return jnp.sum(out) * 1e-20 + acc

        bench(f"{name} gather fwd  (J={M * K}, N={N}, C={C})", fwd, src, idx)

        def bwd(acc, src, idx):
            def f(s):
                out = jnp.take_along_axis(s, idx, axis=1)
                return jnp.sum(out * out)

            g = jax.grad(f)(src + acc * 1e-20)
            return jnp.sum(g) * 1e-20 + acc

        bench(f"{name} gather+scatter bwd", bwd, src, idx)

    print("=== ball query (pallas) ===")
    for name, N, M, r, K, _ in SA_LEVELS:
        xyz = jnp.asarray(rng.uniform(0, 1.5, (B, N, 3)).astype(np.float32))
        q = xyz[:, :M]

        def bq(acc, xyz, q, r=r, K=K):
            idx = ops.ball_query(float(r), K, xyz + acc * 1e-20, q)
            return jnp.sum(idx).astype(jnp.float32) * 1e-20 + acc

        bench(f"{name} ball_query (N={N}, M={M}, K={K})", bq, xyz, q)

    print("=== FPS (pallas) ===")
    for name, N, M, _, _, _ in SA_LEVELS:
        xyz = jnp.asarray(rng.uniform(0, 1.5, (B, N, 3)).astype(np.float32))

        def fps(acc, xyz, M=M):
            i = ops.furthest_point_sample(xyz + acc * 1e-20, M)
            return jnp.sum(i).astype(jnp.float32) * 1e-20 + acc

        bench(f"{name} fps (N={N} -> {M})", fps, xyz)

    print("=== three_nn + interpolate fwd/bwd ===")
    for name, n, m, C in FP_LEVELS:
        unk = jnp.asarray(rng.uniform(0, 1.5, (B, n, 3)).astype(np.float32))
        kno = jnp.asarray(rng.uniform(0, 1.5, (B, m, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(B, m, C)).astype(np.float32))

        def tnn(acc, unk, kno):
            d2, i = ops.three_nn(unk + acc * 1e-20, kno)
            return jnp.sum(d2) * 1e-20 + acc

        bench(f"{name} three_nn ({n} from {m})", tnn, unk, kno)

        d2, nn3 = jax.jit(ops.three_nn)(unk, kno)
        w = jnp.asarray(rng.uniform(0.1, 1, (B, n, 3)).astype(np.float32))
        w = w / jnp.sum(w, -1, keepdims=True)

        from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_dense

        def interp(acc, feats, w):
            out = three_interpolate_dense(feats + acc * 1e-20, nn3, w)
            return jnp.sum(out) * 1e-20 + acc

        bench(f"{name} interp_dense fwd (C={C})", interp, feats, w)

        def interp_bwd(acc, feats, w):
            def f(s):
                return jnp.sum(three_interpolate_dense(s, nn3, w) ** 2)

            g = jax.grad(f)(feats + acc * 1e-20)
            return jnp.sum(g) * 1e-20 + acc

        bench(f"{name} interp_dense bwd (C={C})", interp_bwd, feats, w)

    print("=== pointwise MLP matmul floor (SA1 layer 1) ===")
    h = jnp.asarray(rng.normal(size=(B, 1024, 32, 9)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(9, 32)).astype(np.float32))

    def mm(acc, h, w1):
        out = jnp.einsum("bmkc,cd->bmkd", h + acc * 1e-20, w1)
        return jnp.sum(out) * 1e-20 + acc

    bench("SA1 layer-1 matmul (B,1024,32,9)@(9,32)", mm, h, w1)


if __name__ == "__main__":
    if "--msg" in sys.argv:
        main_msg()
    else:
        main()
