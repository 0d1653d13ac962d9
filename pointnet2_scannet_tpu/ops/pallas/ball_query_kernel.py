"""Pallas TPU kernel for ball query.

The XLA lowering computes a (B, M, N) distance tensor in HBM and runs
lax.top_k over N per query (~200ms for the four SSG levels at B=32) — top_k
is the train step's dominant cost. This kernel fuses the whole op per query
tile in VMEM: compute the distance tile, mask to candidate indices, and
select the first `nsample` in-radius indices in ascending index order with an
iterative masked min (nsample tiny: 16-32), never touching HBM with the
(M, N) intermediates.

Semantics identical to ops.neighborhood.ball_query (= the reference CUDA
kernel, ball_query_gpu.cu:9-44): first nsample hits in index order, rows
padded with the first hit, all-zero rows for empty balls.

Grid: (B, M/TM). Per program: queries tile (TM, 3), all points (3, N) in
VMEM; distance tile (TM, N) f32 scratch. N must be lane-aligned (N % 128 == 0)
and M % TM == 0 — callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ball_query_kernel(xyz_ref, q_ref, out_ref, *, radius: float, nsample: int):
    """xyz_ref: (1, 3, N); q_ref: (1, TM, 3); out_ref: (1, TM, KPAD) int32."""
    x = xyz_ref[0, 0, :][None, :]  # (1, N)
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    qx = q_ref[0, :, 0][:, None]  # (TM, 1)
    qy = q_ref[0, :, 1][:, None]
    qz = q_ref[0, :, 2][:, None]

    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TM, N)
    n = d2.shape[-1]
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    # candidate index or sentinel N when out of radius
    masked = jnp.where(d2 < jnp.float32(radius) * jnp.float32(radius), iota, n)

    tm = d2.shape[0]
    slot = lax.broadcasted_iota(jnp.int32, (tm, out_ref.shape[-1]), 1)
    out_ref[0, ...] = jnp.zeros_like(out_ref[0])

    def body(k, carry):
        prev, first = carry  # (TM, 1) last selected idx; (TM, 1) first hit
        cand = jnp.where(masked > prev, masked, n)
        nxt = jnp.min(cand, axis=1, keepdims=True)  # (TM, 1)
        first = jnp.where(k == 0, nxt, first)
        # pad semantics: no more hits -> repeat first hit (or 0 if none)
        fill = jnp.where(first < n, first, 0)
        val = jnp.where(nxt < n, nxt, fill)
        out_ref[0, ...] = jnp.where(slot == k, val, out_ref[0, ...])
        return jnp.where(nxt < n, nxt, prev), first

    init = (jnp.full((tm, 1), -1, jnp.int32), jnp.full((tm, 1), n, jnp.int32))
    lax.fori_loop(0, nsample, body, init)


def _auto_tile_m(M: int, N: int) -> int:
    """Query-tile rows per program, shrunk so the (TM, N) working set stays
    inside the known-good VMEM envelope (TM*N <= 128*8192, ~4 MB per live
    f32 array; the kernel keeps ~2-3 such arrays live). Halving preserves
    divisibility of M as long as the tile stays even, so 16k/32k-point
    clouds get TM=64/32 instead of a VMEM-overflowing 128."""
    tile_m = min(M, 128)
    while tile_m % 2 == 0 and tile_m * N > 128 * 8192:
        tile_m //= 2
    return tile_m


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "tile_m", "interpret")
)
def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    tile_m: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, 3) x (B, M, 3) -> (B, M, nsample) int32."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    if tile_m is None:
        tile_m = _auto_tile_m(M, N)
    assert N % 128 == 0 and M % tile_m == 0, (N, M, tile_m)
    kpad = max(((nsample + 127) // 128) * 128, 128)
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    kernel = functools.partial(_ball_query_kernel, radius=radius, nsample=nsample)
    out = pl.pallas_call(
        kernel,
        grid=(B, M // tile_m),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_m, 3), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_m, kpad), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, kpad), jnp.int32),
        interpret=interpret,
    )(xyz_t, new_xyz.astype(jnp.float32))
    return out[:, :, :nsample]


def _ball_query_multi_kernel(
    xyz_ref, q_ref, out1_ref, out2_ref, *, radii, nsamples
):
    """Two-radius variant (MSG levels): the distance tile is computed once
    and two first-k-by-index selections run over it."""
    x = xyz_ref[0, 0, :][None, :]
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    qx = q_ref[0, :, 0][:, None]
    qy = q_ref[0, :, 1][:, None]
    qz = q_ref[0, :, 2][:, None]

    d2 = (qx - x) ** 2 + (qy - y) ** 2 + (qz - z) ** 2  # (TM, N)
    n = d2.shape[-1]
    tm = d2.shape[0]
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, 1)

    for out_ref, radius, nsample in zip(
        (out1_ref, out2_ref), radii, nsamples
    ):
        masked = jnp.where(
            d2 < jnp.float32(radius) * jnp.float32(radius), iota, n
        )
        slot = lax.broadcasted_iota(jnp.int32, (tm, out_ref.shape[-1]), 1)
        out_ref[0, ...] = jnp.zeros_like(out_ref[0])

        def body(k, carry, masked=masked, out_ref=out_ref, slot=slot):
            prev, first = carry
            cand = jnp.where(masked > prev, masked, n)
            nxt = jnp.min(cand, axis=1, keepdims=True)
            first = jnp.where(k == 0, nxt, first)
            fill = jnp.where(first < n, first, 0)
            val = jnp.where(nxt < n, nxt, fill)
            out_ref[0, ...] = jnp.where(slot == k, val, out_ref[0, ...])
            return jnp.where(nxt < n, nxt, prev), first

        init = (jnp.full((tm, 1), -1, jnp.int32), jnp.full((tm, 1), n, jnp.int32))
        lax.fori_loop(0, nsample, body, init)


@functools.partial(
    jax.jit, static_argnames=("radii", "nsamples", "tile_m", "interpret")
)
def ball_query_multi_pallas(
    radii: tuple,
    nsamples: tuple,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    tile_m: int | None = None,
    interpret: bool = False,
):
    """Fused two-radius ball query: returns (idx1, idx2), each equal to the
    single-radius op's output for its (radius, nsample)."""
    assert len(radii) == 2 and len(nsamples) == 2
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    if tile_m is None:
        tile_m = _auto_tile_m(M, N)
    assert N % 128 == 0 and M % tile_m == 0, (N, M, tile_m)
    kpads = [max(((k + 127) // 128) * 128, 128) for k in nsamples]
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    kernel = functools.partial(
        _ball_query_multi_kernel,
        radii=tuple(float(r) for r in radii),
        nsamples=tuple(int(k) for k in nsamples),
    )
    out1, out2 = pl.pallas_call(
        kernel,
        grid=(B, M // tile_m),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, tile_m, 3), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (1, tile_m, kp), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
            )
            for kp in kpads
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, M, kp), jnp.int32) for kp in kpads
        ),
        interpret=interpret,
    )(xyz_t, new_xyz.astype(jnp.float32))
    return out1[:, :, : nsamples[0]], out2[:, :, : nsamples[1]]
