"""Pallas TPU kernel for 3-nearest-neighbor search.

The XLA lowering materializes the (B, n, m) distance tensor and runs
lax.top_k(3) over m (~100ms for the big FP level at B=32). This kernel works
per query tile in VMEM: distance tile (TM, m), then three min/argmin passes
with the selected column knocked out between passes. Tie-break: lowest index
wins (== the CUDA strict-< insertion order, interpolate_gpu.cu:34-49).

Grid: (B, n/TM). m must be lane-aligned (m % 128 == 0); callers fall back to
the XLA path otherwise (the small FP levels are cheap there anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _three_nn_kernel(known_ref, q_ref, dist_ref, idx_ref):
    """known: (1, 3, m); q: (1, TM, 3); dist/idx: (1, TM, KPAD)."""
    x = known_ref[0, 0, :][None, :]  # (1, m)
    y = known_ref[0, 1, :][None, :]
    z = known_ref[0, 2, :][None, :]
    qx = q_ref[0, :, 0][:, None]  # (TM, 1)
    qy = q_ref[0, :, 1][:, None]
    qz = q_ref[0, :, 2][:, None]

    d = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TM, m)
    m = d.shape[-1]
    tm = d.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, d.shape, 1)
    slot = lax.broadcasted_iota(jnp.int32, (tm, dist_ref.shape[-1]), 1)

    dist_ref[0, ...] = jnp.zeros_like(dist_ref[0])
    idx_ref[0, ...] = jnp.zeros_like(idx_ref[0])

    def body(k, d):
        dmin = jnp.min(d, axis=1, keepdims=True)  # (TM, 1)
        sel = jnp.min(jnp.where(d == dmin, iota, m), axis=1, keepdims=True)
        dist_ref[0, ...] = jnp.where(slot == k, dmin, dist_ref[0, ...])
        idx_ref[0, ...] = jnp.where(slot == k, sel, idx_ref[0, ...])
        return jnp.where(iota == sel, jnp.float32(jnp.inf), d)

    lax.fori_loop(0, 3, body, d)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def three_nn_pallas(
    unknown: jnp.ndarray,
    known: jnp.ndarray,
    *,
    tile_m: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, n, 3) x (B, m, 3) -> (dist2 (B, n, 3), idx (B, n, 3) int32)."""
    B, n, _ = unknown.shape
    m = known.shape[1]
    if tile_m is None:
        tile_m = min(n, 256)
    assert m % 128 == 0 and n % tile_m == 0, (m, n, tile_m)
    known_t = jnp.transpose(known.astype(jnp.float32), (0, 2, 1))  # (B, 3, m)
    dist, idx = pl.pallas_call(
        _three_nn_kernel,
        grid=(B, n // tile_m),
        in_specs=[
            pl.BlockSpec((1, 3, m), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_m, 3), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tile_m, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, tile_m, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n, 128), jnp.int32),
        ),
        interpret=interpret,
    )(known_t, unknown.astype(jnp.float32))
    return dist[:, :, :3], idx[:, :, :3]
