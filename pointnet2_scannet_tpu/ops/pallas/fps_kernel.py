"""Pallas TPU kernel for furthest-point sampling.

FPS is the one inherently sequential primitive (npoint dependent iterations,
sampling_gpu.cu:89-172). The XLA fallback runs the whole (B, N) distance
update + argmax per step from HBM; this kernel keeps everything VMEM-resident
for the entire selection loop — one HBM read of xyz, one HBM write of the
indices.

Layout: the WHOLE batch is processed in one program (grid=()) with batch on
the sublane axis and points on the 128-wide lane axis — every per-iteration
op is a (B, N) VPU op covering all batch rows at once. (A one-program-per-
batch-row grid serializes on a single TensorCore: B x npoint sequential
iterations instead of npoint.) VMEM footprint: 4 x (B, N) f32 buffers — for
B=32, N=8192 that's 4 MB of the ~16 MB budget.

The selected point's coordinates are fetched with a one-hot masked max
(lane-crossing dynamic gathers are not vectorizable on TPU); the new index
is blended into the output row with a masked full-row write (VMEM takes no
scalar stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, *, npoint: int,
                skip_near_origin: bool):
    """x/y/z: (B, N) f32 VMEM; out: (B, npoint_padded) int32;
    mind: (B, N) f32 scratch."""
    x = x_ref[...]
    y = y_ref[...]
    z = z_ref[...]

    if skip_near_origin:
        # reference skips points with |p|^2 <= 1e-3 (sampling_gpu.cu:100-101).
        # The predicate is folded into the mind INIT: invalid lanes start at
        # -1 and stay there (min(-1, d>=0) == -1), so the selection argmax
        # needs no per-iteration where(valid, ...) pass.
        valid = (x * x + y * y + z * z) > 1e-3
        mind_ref[...] = jnp.where(valid, jnp.float32(1e10), jnp.float32(-1.0))
    else:
        mind_ref[...] = jnp.full(x.shape, 1e10, jnp.float32)
    out_ref[...] = jnp.zeros_like(out_ref)

    col = lax.broadcasted_iota(jnp.int32, x.shape, 1)  # (B, N)
    slot = lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)  # (B, P)

    def body(j, last):
        # last: (B, 1) indices of the previously selected points
        sel = col == last
        neg = jnp.float32(-jnp.inf)
        x1 = jnp.max(jnp.where(sel, x, neg), axis=1, keepdims=True)
        y1 = jnp.max(jnp.where(sel, y, neg), axis=1, keepdims=True)
        z1 = jnp.max(jnp.where(sel, z, neg), axis=1, keepdims=True)
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        mind = jnp.minimum(mind_ref[...], d)
        mind_ref[...] = mind
        # lowest-index-wins argmax over lanes, batched over sublanes
        # (invalid lanes sit at -1 < every real min-distance)
        best = jnp.argmax(mind, axis=1, keepdims=True).astype(jnp.int32)
        out_ref[...] = jnp.where(slot == j, best, out_ref[...])
        return best

    lax.fori_loop(1, npoint, body, jnp.zeros((x.shape[0], 1), jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("npoint", "skip_near_origin", "interpret")
)
def furthest_point_sample_pallas(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    skip_near_origin: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, N, 3) float32 -> (B, npoint) int32, VMEM-resident selection loop.

    The kernel keeps ~4 (B, N) f32 buffers in VMEM; batches beyond what fits
    (about 64 rows at N=8192) are processed in chunks.
    """
    B, N, _ = xyz.shape
    # cap VMEM: 4 live (B, N) f32 buffers within ~8 MB
    b_max = max(8 * 1024 * 1024 // (4 * 4 * max(N, 1)), 8)
    if B > b_max:
        chunks = [
            furthest_point_sample_pallas(
                xyz[i : i + b_max],
                npoint,
                skip_near_origin=skip_near_origin,
                interpret=interpret,
            )
            for i in range(0, B, b_max)
        ]
        return jnp.concatenate(chunks, axis=0)
    xyz = xyz.astype(jnp.float32)
    x = xyz[:, :, 0]
    y = xyz[:, :, 1]
    z = xyz[:, :, 2]
    npoint_pad = max(((npoint + 127) // 128) * 128, 128)
    kernel = functools.partial(
        _fps_kernel, npoint=npoint, skip_near_origin=skip_near_origin
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npoint_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out[:, :npoint]
