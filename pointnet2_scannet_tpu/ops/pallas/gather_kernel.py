"""Pallas TPU gather via one-hot MXU matmuls.

XLA's TPU gather is pathological for point-cloud grouping: rows of 3-9
floats (far below the 128-lane width) gathered a million at a time run at
~1 GB/s effective (profiled: the two SA1 grouping gathers cost ~21 ms of a
73 ms train step). This kernel instead builds, per index tile, a one-hot
selection matrix in VMEM and contracts it with the (N, C) source on the MXU:

    out[j, c] = sum_n 1[idx[j] == n] * src[n, c]

The custom VJP runs the transposed contraction (scatter-add as a matmul),
accumulating across index tiles by revisiting the same output block.

Constraints: N % 128 == 0 and the flattened index count J % TILE_J == 0
(universally true for the SA/FP levels); C is padded to 128 lanes inside the
kernel by the block layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_J = 128


def _gather_fwd_kernel(src_ref, idx_ref, out_ref):
    """src: (1, N, C); idx: (1, 1, J) (full row; sliced per program);
    out: (1, TILE_J, C)."""
    n = src_ref.shape[1]
    j = pl.program_id(1)
    idx = idx_ref[0, 0, pl.ds(j * TILE_J, TILE_J)][:, None]  # (TJ, 1)
    cols = lax.broadcasted_iota(jnp.int32, (TILE_J, n), 1)
    onehot = (cols == idx).astype(src_ref.dtype)  # (TJ, N)
    # Precision.HIGHEST: the v5e MXU multiplies in bf16 by default, which
    # would round the gathered values; a gather must be bit-exact.
    out_ref[0, ...] = jax.lax.dot_general(
        onehot,
        src_ref[0, ...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=out_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def _gather_bwd_kernel(g_ref, idx_ref, dsrc_ref):
    """g: (1, TILE_J, C); idx: (1, 1, J); dsrc: (1, N, C) accumulated
    across the j grid dimension (same output block revisited)."""
    j = pl.program_id(1)
    n = dsrc_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dsrc_ref[0, ...] = jnp.zeros_like(dsrc_ref[0])

    idx = idx_ref[0, 0, pl.ds(j * TILE_J, TILE_J)][:, None]
    cols = lax.broadcasted_iota(jnp.int32, (TILE_J, n), 1)
    onehot = (cols == idx).astype(g_ref.dtype)  # (TJ, N)
    dsrc_ref[0, ...] += jax.lax.dot_general(
        onehot,
        g_ref[0, ...],
        dimension_numbers=(((0,), (0,)), ((), ())),  # onehot^T @ g
        preferred_element_type=dsrc_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@jax.custom_vjp
def mxu_gather(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) x (B, J) int32 -> (B, J, C), J % 128 == 0, N % 128 == 0."""
    return _mxu_gather_fwd_only(src, idx)


@jax.jit
def _mxu_gather_fwd_only(src, idx):
    B, N, C = src.shape
    J = idx.shape[1]
    return pl.pallas_call(
        _gather_fwd_kernel,
        grid=(B, J // TILE_J),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, J), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, J, C), src.dtype),
    )(src, idx.reshape(B, 1, J))


@functools.partial(jax.jit, static_argnames=("n",))
def _mxu_gather_bwd(idx, g, n):
    B, J, C = g.shape
    return pl.pallas_call(
        _gather_bwd_kernel,
        grid=(B, J // TILE_J),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, J), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, C), g.dtype),
    )(g, idx.reshape(B, 1, J))


def _fwd(src, idx):
    return _mxu_gather_fwd_only(src, idx), (idx, src.shape[1])


def _bwd(res, g):
    idx, n = res
    return _mxu_gather_bwd(idx, g, n=n), None


mxu_gather.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# 3-way bf16-split variant: exact f32 gather at bf16 MXU rate.
#
# The MXU multiplies bf16 natively; an f32 matmul costs multiple decomposition
# passes. A gather is one-hot @ src where the one-hot side is EXACT in bf16,
# so only src needs decomposing. Truncation-split src into three bf16 planes
# (top 16 f32 bits are literally a bf16; the two remainders span <=16 and <=8
# mantissa positions), gather each with one bf16 pass, and the f32 sum
# hi+mid+lo reconstructs the original f32 values BIT-EXACTLY (each partial is
# an exact prefix of the source mantissa).
# ---------------------------------------------------------------------------


def _trunc_bf16(x: jnp.ndarray) -> jnp.ndarray:
    """Round-toward-zero f32 -> bf16 (drop the low 16 bits)."""
    masked = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32,
    )
    return masked.astype(jnp.bfloat16)


def split3_bf16(x: jnp.ndarray):
    """f32 -> (hi, mid, lo) bf16 with x == hi + mid + lo exactly."""
    hi = _trunc_bf16(x)
    r1 = x - hi.astype(jnp.float32)
    mid = _trunc_bf16(r1)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _gather_fwd3_kernel(hi_ref, mid_ref, lo_ref, idx_ref, out_ref):
    n = hi_ref.shape[1]
    j = pl.program_id(1)
    idx = idx_ref[0, 0, pl.ds(j * TILE_J, TILE_J)][:, None]
    cols = lax.broadcasted_iota(jnp.int32, (TILE_J, n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for part in (hi_ref, mid_ref, lo_ref):
        acc += jax.lax.dot_general(
            onehot,
            part[0, ...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0, ...] = acc


def _gather_bwd3_kernel(ghi_ref, gmid_ref, glo_ref, idx_ref, dsrc_ref):
    j = pl.program_id(1)
    n = dsrc_ref.shape[1]

    @pl.when(j == 0)
    def _():
        dsrc_ref[0, ...] = jnp.zeros_like(dsrc_ref[0])

    idx = idx_ref[0, 0, pl.ds(j * TILE_J, TILE_J)][:, None]
    cols = lax.broadcasted_iota(jnp.int32, (TILE_J, n), 1)
    onehot = (cols == idx).astype(jnp.bfloat16)
    acc = jnp.zeros((n, dsrc_ref.shape[-1]), jnp.float32)
    for part in (ghi_ref, gmid_ref, glo_ref):
        acc += jax.lax.dot_general(
            onehot,
            part[0, ...],
            dimension_numbers=(((0,), (0,)), ((), ())),  # onehot^T @ g
            preferred_element_type=jnp.float32,
        )
    dsrc_ref[0, ...] += acc


@jax.custom_vjp
def mxu_gather_split(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Exact f32 (B, N, C) x (B, J) -> (B, J, C) via 3 bf16 MXU passes."""
    return _mxu_gather_split_fwd_only(src, idx)


@jax.jit
def _mxu_gather_split_fwd_only(src, idx):
    B, N, C = src.shape
    J = idx.shape[1]
    hi, mid, lo = split3_bf16(src.astype(jnp.float32))
    out = pl.pallas_call(
        _gather_fwd3_kernel,
        grid=(B, J // TILE_J),
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, J), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, J, C), jnp.float32),
    )(hi, mid, lo, idx.reshape(B, 1, J))
    return out.astype(src.dtype)


@functools.partial(jax.jit, static_argnames=("n",))
def _mxu_gather_split_bwd(idx, g, n):
    B, J, C = g.shape
    ghi, gmid, glo = split3_bf16(g.astype(jnp.float32))
    out = pl.pallas_call(
        _gather_bwd3_kernel,
        grid=(B, J // TILE_J),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TILE_J, C), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, J), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, C), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, n, C), jnp.float32),
    )(ghi, gmid, glo, idx.reshape(B, 1, J))
    return out.astype(g.dtype)


def _fwd3(src, idx):
    return _mxu_gather_split_fwd_only(src, idx), (idx, src.shape[1])


def _bwd3(res, g):
    idx, n = res
    return _mxu_gather_split_bwd(idx, g, n=n), None


mxu_gather_split.defvjp(_fwd3, _bwd3)


def supported(src: jnp.ndarray, idx_flat_len: int) -> bool:
    """Shapes the kernel handles with a sane VMEM footprint."""
    B, N, C = src.shape
    return (
        N % 128 == 0
        and idx_flat_len % TILE_J == 0
        # src block + onehot tile must fit comfortably in VMEM
        and N * max(C, 128) * 4 <= 6 * 1024 * 1024
        and TILE_J * N * 4 <= 6 * 1024 * 1024
    )


def scatter_supported(n: int, j: int, c: int) -> bool:
    """Shapes for which the 3x-bf16-split MXU scatter (the split-gather's
    backward kernel) beats XLA's scatter-add: lane-aligned N, tileable J,
    and the (n, C) f32 accumulator + a few (TILE_J, C) tiles in VMEM.
    Measured at the SA levels: SA2 (J=8192, N=1024, C=67) 2.1 ms vs XLA's
    4.1; SA3 0.4 vs 0.7 (scan-floor-subtracted). The contraction pays
    J*n*max(C,128) MXU MACs, so big-N/skinny-C scatters (e.g. SA1's
    J=32768, n=8192, C=9 — which the train step DCEs anyway) must stay on
    XLA's scatter: gate on the measured-win envelope."""
    return (
        n % 128 == 0
        and 128 <= n <= 2048
        and j % TILE_J == 0
        and TILE_J <= j <= 16384
        and c >= 32
        and (n * c + 6 * TILE_J * c) * 4 <= 8 * 1024 * 1024
    )


def mxu_scatter_add(idx: jnp.ndarray, g: jnp.ndarray, n: int) -> jnp.ndarray:
    """Deterministic scatter-add dsrc[b, idx[b, j], :] += g[b, j, :] as
    exact 3x-bf16-split one-hot MXU matmuls. Check scatter_supported first."""
    return _mxu_gather_split_bwd(idx, g, n=n)
