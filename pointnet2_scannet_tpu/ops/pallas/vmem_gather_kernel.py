"""Pallas TPU kernel: VMEM-resident row gather via chunk-select lane gathers.

The grouping/gather sources in PointNet++ are tiny — (N<=8192, C<=~260) is at
most ~1 MB — yet XLA's native gather streams them through HBM row by row at
~5 GB/s effective (measured: 13.7 ms for the SA1 grouped gather,
scripts/bench_hotops.py). The TPU's only hardware gather primitive is a
per-sublane-row LANE gather within a 128-lane span (Mosaic lowers
`jnp.take_along_axis(x, i, axis=-1)` on (S, 128) tiles to it). This kernel
builds the general (B, N, C) x (B, J) -> (B, J, C) row gather out of that
primitive:

  - source rides VMEM channels-first (C, N), indices as (S, 128) tiles,
  - split each index into (chunk, lane) = (idx >> 7, idx & 127),
  - for each 128-point chunk of the source: broadcast its (C, 128) slab
    across the index tiles, lane-gather, and select where chunk matches.

Cost is J*C*(N/128) select-gather element-ops on the VPU — for SA1
(J=32768, C=9, N=8192) that measures 4.5 ms vs XLA's 13.5 ms, with the
channels-first transposes fused away by XLA on both sides. The one-hot MXU
alternative (gather_kernel.py) pays J*N*C-independent matmul FLOPs and loses
at these shapes (38 ms); this kernel's work scales with C*N/128 instead of N.

Reference semantics: group_points / gather_points are plain row gathers
(group_points_gpu.cu:8-33, sampling_gpu.cu:8-30). Backward is the usual
deterministic scatter-add, done by XLA outside the kernel (identical to
take_along_axis's VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for auto-selection: src slab + out + a few (C, S, 128)
# intermediates must fit comfortably in the ~16 MB core VMEM.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _gather_kernel(src_ref, idx_ref, out_ref):
    """src (1, C, N); idx (1, S, 128) i32; out (1, C, S, 128)."""
    C, N = src_ref.shape[1], src_ref.shape[2]
    S = idx_ref.shape[1]
    idxm = idx_ref[0]  # (S, 128)
    chunk = lax.shift_right_logical(idxm, 7)
    lane = jnp.bitwise_and(idxm, 127)
    laneb = jnp.broadcast_to(lane[None], (C, S, 128)).reshape(C * S, 128)

    def body(k, acc):
        slab = src_ref[0, :, pl.ds(k * 128, 128)]  # (C, 128)
        vb = jnp.broadcast_to(slab[:, None, :], (C, S, 128)).reshape(C * S, 128)
        g = jnp.take_along_axis(vb, laneb, axis=1)
        m = jnp.broadcast_to((chunk == k)[None], (C, S, 128)).reshape(C * S, 128)
        return jnp.where(m, g, acc)

    acc = lax.fori_loop(
        0, N // 128, body, jnp.zeros((C * S, 128), src_ref.dtype)
    )
    out_ref[0] = acc.reshape(C, S, 128)


def _fits(N: int, C: int, ts: int) -> bool:
    return (C * N + 4 * C * ts * 128 + ts * 128) * 4 <= _VMEM_BUDGET_BYTES


def _tile_s(N: int, C: int, S: int) -> int:
    """Largest legal index-tile (in 128-lane rows) that keeps the working set
    — source slab + ~4 (C, TS, 128) intermediates — under the VMEM budget.
    Mosaic requires the block's sublane dim to be a multiple of 8 or the full
    array dim, so tiles are multiples of 8 dividing S (or S itself)."""
    if _fits(N, C, S):
        return S
    cands = [d for d in range(8, S, 8) if S % d == 0 and _fits(N, C, d)]
    return max(cands) if cands else S


@functools.partial(jax.jit, static_argnames=("interpret",))
def _vmem_gather_fwd_only(src, idx, interpret=False):
    """(B, N, C) f32/i32 x (B, J) i32 -> (B, J, C), no autodiff."""
    B, N, C = src.shape
    J = idx.shape[1]
    S = J // 128
    TS = _tile_s(N, C, S)
    src_t = jnp.transpose(src, (0, 2, 1))  # fused into the kernel feed
    idxm = idx.reshape(B, S, 128)
    out = pl.pallas_call(
        _gather_kernel,
        grid=(B, S // TS),
        in_specs=[
            pl.BlockSpec(
                (1, C, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, TS, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, C, TS, 128), lambda b, j: (b, 0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, S, 128), src.dtype),
        interpret=interpret,
    )(src_t, idxm)
    # (B, C, S, 128) -> (B, J, C); XLA fuses this into the consumer
    return jnp.transpose(out.reshape(B, C, J), (0, 2, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def vmem_gather(src: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    """Row gather (B, N, C) x (B, J) -> (B, J, C) with scatter-add VJP.

    dtype support: float32/int32 natively; bfloat16 with even C rides as
    bitcast int32 lane pairs (use `vmem_gather_any`, which handles the
    packing). Gradient w.r.t. src is XLA's deterministic scatter-add —
    identical to take_along_axis's VJP (and to the reference's atomicAdd
    contract, group_points_gpu.cu:60, up to summation order).
    """
    return _vmem_gather_fwd_only(src, idx, interpret=interpret)


def _vjp_fwd(src, idx, interpret=False):
    return _vmem_gather_fwd_only(src, idx, interpret=interpret), (
        idx,
        src.shape[1],
    )


def _vjp_bwd(interpret, res, g):
    idx, n = res
    B, J, C = g.shape
    if not interpret:
        from pointnet2_scannet_tpu.ops.pallas import gather_kernel as gk

        if gk.scatter_supported(n, J, C):
            # exact 3x-bf16-split one-hot MXU matmul scatter — ~2x XLA's
            # scatter-add at the SA shapes (see gather_kernel.mxu_scatter_add)
            return gk.mxu_scatter_add(idx, g, n), None
    # accumulate in f32 and round once at the end — matches the MXU scatter
    # path above (bf16 accumulation loses low bits on many-neighbor scatters)
    acc_dtype = jnp.float32 if g.dtype == jnp.bfloat16 else g.dtype
    dsrc = jnp.zeros((B, n, C), acc_dtype)
    dsrc = dsrc.at[
        jnp.arange(B, dtype=idx.dtype)[:, None], idx, :
    ].add(g.astype(acc_dtype))
    return dsrc.astype(g.dtype), None


vmem_gather.defvjp(_vjp_fwd, _vjp_bwd)


def _pack_bf16(x):
    """bf16 (B, N, C even) -> i32 (B, N, C//2) lane pairs."""
    B, N, C = x.shape
    return lax.bitcast_convert_type(x.reshape(B, N, C // 2, 2), jnp.int32)


def _unpack_bf16(x, C):
    B, J, _ = x.shape
    return lax.bitcast_convert_type(x, jnp.bfloat16).reshape(B, J, C)


def supported(src: jnp.ndarray, j: int) -> bool:
    """Shapes/dtypes this kernel handles within the VMEM budget."""
    B, N, C = src.shape
    if N % 128 != 0 or j % 128 != 0 or j < 128:
        return False
    if src.dtype == jnp.bfloat16:
        if C % 2 != 0:
            return False
        C, esz = C // 2, 4
    elif src.dtype in (jnp.float32, jnp.int32):
        esz = 4
    else:
        return False
    # J is tiled down to fit the VMEM budget; the smallest legal tile
    # (a multiple of 8 dividing S, else all of S) must fit
    S = j // 128
    ts = _tile_s(N, C, S)
    return _fits(N, C, ts)


def vmem_gather_any(
    src: jnp.ndarray, idx: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """vmem_gather with bf16 pair-packing. Call `supported()` first."""
    if src.dtype == jnp.bfloat16:
        return _bf16_gather(src, idx, interpret)
    return vmem_gather(src, idx, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bf16_gather(src, idx, interpret=False):
    return _unpack_bf16(
        _vmem_gather_fwd_only(_pack_bf16(src), idx, interpret=interpret),
        src.shape[-1],
    )


def _bf16_fwd(src, idx, interpret=False):
    return _bf16_gather(src, idx, interpret), (idx, src.shape[1])


_bf16_gather.defvjp(_bf16_fwd, _vjp_bwd)
