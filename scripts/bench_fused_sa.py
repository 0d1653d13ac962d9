"""Experiment: fuse the SA1 layer-0 matmul INTO the chunk-select VMEM gather.

VERDICT r4 weak #4 / SURVEY §7 step 9: the chunk-select gather
(ops/pallas/vmem_gather_kernel.py) wins standalone, but its (B, M, K, C)
output round-trips HBM before the first PointwiseMLP matmul consumes it.
This kernel keeps the gathered (C, S, 128) tile in VMEM and applies the
layer-0 kernel W (C, F) in-kernel (per-channel VPU multiply-accumulate —
C*F fused MACs per (S, 128) tile, trivial next to the gather's C*N/128
select passes), writing only the (B, J, F) pre-activations.

At C=9 -> F=32 the output is WIDER than the input, so the fusion saves the
(B, J, 9) round trip + one XLA matmul dispatch but writes 3.5x the bytes;
at wide C the pregather composition (scripts/bench_pregather.py) reorders
the math instead. This script measures whether the narrow-C fusion pays at
the flagship SA1 shape. Correctness is asserted against the unfused
composition before timing.

Usage: python scripts/bench_fused_sa.py [--quick]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache


def _gather_mm_kernel(src_ref, idx_ref, w_ref, out_ref):
    """src (1, C, N); idx (1, S, 128) i32; w (C, F); out (1, F, S, 128)."""
    C, N = src_ref.shape[1], src_ref.shape[2]
    S = idx_ref.shape[1]
    F = w_ref.shape[1]
    idxm = idx_ref[0]
    chunk = lax.shift_right_logical(idxm, 7)
    lane = jnp.bitwise_and(idxm, 127)
    laneb = jnp.broadcast_to(lane[None], (C, S, 128)).reshape(C * S, 128)

    def body(k, acc):
        slab = src_ref[0, :, pl.ds(k * 128, 128)]
        vb = jnp.broadcast_to(slab[:, None, :], (C, S, 128)).reshape(C * S, 128)
        g = jnp.take_along_axis(vb, laneb, axis=1)
        m = jnp.broadcast_to((chunk == k)[None], (C, S, 128)).reshape(C * S, 128)
        return jnp.where(m, g, acc)

    acc = lax.fori_loop(0, N // 128, body, jnp.zeros((C * S, 128), src_ref.dtype))
    g3 = acc.reshape(C, S, 128)
    # layer-0 matmul in VMEM: out[f] = sum_c w[c, f] * g3[c] — C*F
    # multiply-accumulates of (S, 128) tiles on the VPU
    for f in range(F):
        o = jnp.zeros((S, 128), jnp.float32)
        for c in range(C):
            o = o + w_ref[c, f] * g3[c].astype(jnp.float32)
        out_ref[0, f] = o.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def fused_gather_mm(src, idx, w):
    """(B, N, C) x (B, J) x (C, F) -> (B, J, F) = gather(src)[j] @ w."""
    B, N, C = src.shape
    J = idx.shape[1]
    F = w.shape[1]
    S = J // 128
    src_t = jnp.transpose(src, (0, 2, 1))
    idxm = idx.reshape(B, S, 128)
    out = pl.pallas_call(
        _gather_mm_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, F), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, F, S, 128), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, F, S, 128), src.dtype),
    )(src_t, idxm, w)
    return jnp.transpose(out.reshape(B, F, J), (0, 2, 1))


def _scan_time(jfn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = jfn(*args)
    float(np.asarray(out).reshape(-1)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(np.asarray(out).reshape(-1)[-1])
    return (time.perf_counter() - t0) / iters


def main(quick: bool):
    from pointnet2_scannet_tpu.ops.pallas.vmem_gather_kernel import vmem_gather

    B = 8 if quick else 32
    N, M, K, C, F = 8192, 1024, 32, 9, 32
    J = M * K
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, J)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(C, F)).astype(np.float32) * 0.1)

    # correctness vs an f64 numpy reference (the XLA einsum itself runs the
    # MXU's default bf16-pass f32 at ~1e-3 — comparing against it would
    # punish the kernel's full-f32 VPU accumulation for being MORE precise)
    src_h = np.asarray(src).astype(np.float64)
    w_h = np.asarray(w).astype(np.float64)
    idx_h = np.asarray(idx)
    ref = np.einsum(
        "bjc,cf->bjf",
        np.take_along_axis(src_h, idx_h[..., None], axis=1),
        w_h,
    )
    scale = np.max(np.abs(ref))
    got = np.asarray(fused_gather_mm(src, idx, w)).astype(np.float64)
    unf = np.asarray(
        jax.jit(lambda s, i, ww: jnp.einsum("bjc,cf->bjf", vmem_gather(s, i), ww))(
            src, idx, w
        )
    ).astype(np.float64)
    err_f = np.max(np.abs(ref - got)) / scale
    err_u = np.max(np.abs(ref - unf)) / scale
    print(
        f"rel max err vs f64: fused kernel {err_f:.2e} | "
        f"unfused gather+einsum {err_u:.2e}"
    )
    assert err_f < 1e-5

    unfused = jax.jit(
        lambda s, i, ww: jnp.sum(
            jnp.einsum("bjc,cf->bjf", vmem_gather(s, i), ww)
        )
    )
    fused = jax.jit(lambda s, i, ww: jnp.sum(fused_gather_mm(s, i, ww)))
    gather_only = jax.jit(lambda s, i: jnp.sum(vmem_gather(s, i)))

    t_g = _scan_time(gather_only, src, idx)
    t_u = _scan_time(unfused, src, idx, w)
    t_f = _scan_time(fused, src, idx, w)
    print(
        f"SA1 (B={B} J={J} N={N} C={C} F={F}) f32: "
        f"gather-only {t_g * 1e3:.2f} ms | "
        f"gather+XLA-matmul {t_u * 1e3:.2f} ms | "
        f"fused kernel {t_f * 1e3:.2f} ms"
    )


if __name__ == "__main__":
    enable_compilation_cache()
    main("--quick" in sys.argv)
