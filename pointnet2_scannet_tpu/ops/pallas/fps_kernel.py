"""Pallas TPU kernel for furthest-point sampling.

FPS is the one inherently sequential primitive (npoint dependent iterations,
sampling_gpu.cu:89-172). The XLA fallback runs the whole (B, N) distance
update + argmax per step from HBM; this kernel instead keeps the per-batch
coordinate block and the running min-distance array resident in VMEM for the
entire selection loop — one HBM read of xyz, one HBM write of the indices.

Grid: one program per batch element. Layout inside the kernel: coordinates
as (3, N) so the N axis rides the 128-wide lanes; distances as (1, N) f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(
    xyz_ref, out_ref, mind_ref, idx_ref, *, npoint: int, skip_near_origin: bool
):
    """xyz_ref: (1, 3, N) VMEM; out_ref: (1, 1, npoint_padded) int32;
    mind: (1, N) f32 scratch; idx: (1, npoint_padded) int32 scratch.

    TPU VMEM takes no scalar stores, so each selected index is blended into
    the idx scratch row with a masked full-row write (npoint lanes, VPU) and
    the row is flushed to the output once at the end.
    """
    x = xyz_ref[0, 0, :][None, :]  # (1, N)
    y = xyz_ref[0, 1, :][None, :]
    z = xyz_ref[0, 2, :][None, :]
    n = x.shape[-1]

    if skip_near_origin:
        # reference skips points with |p|^2 <= 1e-3 (sampling_gpu.cu:100-101)
        valid = (x * x + y * y + z * z) > 1e-3
    else:
        valid = jnp.ones_like(x, dtype=jnp.bool_)

    mind_ref[...] = jnp.full((1, n), 1e10, jnp.float32)
    idx_ref[...] = jnp.zeros_like(idx_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, idx_ref.shape, 1)

    def body(j, last):
        # gather the previously selected point's coordinates
        sel = col == last
        x1 = jnp.max(jnp.where(sel, x, -jnp.inf))
        y1 = jnp.max(jnp.where(sel, y, -jnp.inf))
        z1 = jnp.max(jnp.where(sel, z, -jnp.inf))
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        cand = jnp.where(valid, mind, -1.0)
        # lowest-index-wins argmax over the lane axis
        best = jnp.argmax(cand, axis=-1)[0].astype(jnp.int32)
        idx_ref[...] = jnp.where(slot == j, best, idx_ref[...])
        return best

    lax.fori_loop(1, npoint, body, jnp.int32(0))
    out_ref[0, ...] = idx_ref[...]


@functools.partial(jax.jit, static_argnames=("npoint", "skip_near_origin"))
def furthest_point_sample_pallas(
    xyz: jnp.ndarray, npoint: int, *, skip_near_origin: bool = True
) -> jnp.ndarray:
    """(B, N, 3) float32 -> (B, npoint) int32, VMEM-resident selection loop."""
    B, N, _ = xyz.shape
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # (B, 3, N)
    npoint_pad = max(((npoint + 127) // 128) * 128, 128)
    kernel = functools.partial(
        _fps_kernel, npoint=npoint, skip_near_origin=skip_near_origin
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, npoint_pad), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, N), jnp.float32),
            pltpu.VMEM((1, npoint_pad), jnp.int32),
        ],
    )(xyz_t)
    return out[:, 0, :npoint]
