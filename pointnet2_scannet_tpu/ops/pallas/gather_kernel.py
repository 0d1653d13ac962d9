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
