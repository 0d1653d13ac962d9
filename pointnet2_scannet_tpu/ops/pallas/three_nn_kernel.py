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


def _three_nn_t_kernel(known_ref, q_ref, dist_ref, idx_ref):
    """Transposed variant. known: (1, m, 3); q: (1, 3, TN); dist/idx:
    (1, 3, TN).

    Distances live as (m, TN) — known points on sublanes, queries on lanes —
    so each of the three min/argmin passes reduces over sublanes straight
    into the (1, TN) output row it will be stored as. Compared to the
    query-major kernel this removes the 128-lane output padding (a 42x HBM
    write amplification at the big FP level) and the masked full-block
    output rewrites inside the selection loop; the knockout passes are
    unrolled (k=3) with no ref round-trips of d.
    """
    x = known_ref[0, :, 0:1]  # (m, 1)
    y = known_ref[0, :, 1:2]
    z = known_ref[0, :, 2:3]
    qx = q_ref[0, 0:1, :]  # (1, TN)
    qy = q_ref[0, 1:2, :]
    qz = q_ref[0, 2:3, :]

    d = (x - qx) ** 2 + (y - qy) ** 2 + (z - qz) ** 2  # (m, TN)
    m = d.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, d.shape, 0)
    inf = jnp.float32(jnp.inf)

    d0 = jnp.min(d, axis=0, keepdims=True)  # (1, TN)
    s0 = jnp.min(jnp.where(d == d0, iota, m), axis=0, keepdims=True)
    d1m = jnp.where(iota == s0, inf, d)
    d1 = jnp.min(d1m, axis=0, keepdims=True)
    s1 = jnp.min(jnp.where(d1m == d1, iota, m), axis=0, keepdims=True)
    d2m = jnp.where(iota == s1, inf, d1m)
    d2 = jnp.min(d2m, axis=0, keepdims=True)
    s2 = jnp.min(jnp.where(d2m == d2, iota, m), axis=0, keepdims=True)

    dist_ref[0, 0, :] = d0[0]
    dist_ref[0, 1, :] = d1[0]
    dist_ref[0, 2, :] = d2[0]
    idx_ref[0, 0, :] = s0[0]
    idx_ref[0, 1, :] = s1[0]
    idx_ref[0, 2, :] = s2[0]


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def three_nn_pallas_t(
    unknown: jnp.ndarray,
    known: jnp.ndarray,
    *,
    tile_n: int | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, n, 3) x (B, m, 3) -> (dist2 (B, n, 3), idx (B, n, 3) int32).

    Known-major distance tiles: needs n lane-aligned (n % 128 == 0) but
    relaxes the query-major kernel's m % 128 constraint to the sublane
    granularity (m % 8 == 0), so FP3-sized levels (m=64) qualify too.
    """
    B, n, _ = unknown.shape
    m = known.shape[1]
    if tile_n is None:
        tile_n = min(n, 256)
    assert n % tile_n == 0 and tile_n % 128 == 0 and m % 8 == 0, (n, tile_n, m)
    q_t = jnp.transpose(unknown.astype(jnp.float32), (0, 2, 1))  # (B, 3, n)
    dist, idx = pl.pallas_call(
        _three_nn_t_kernel,
        grid=(B, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, m, 3), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 3, tile_n), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 3, tile_n), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, tile_n), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, n), jnp.int32),
        ),
        interpret=interpret,
    )(known.astype(jnp.float32), q_t)
    return jnp.transpose(dist, (0, 2, 1)), jnp.transpose(idx, (0, 2, 1))


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
