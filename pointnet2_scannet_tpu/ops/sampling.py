"""Furthest-point sampling and index gathers.

Contract matched against the reference CUDA kernels:
  - furthest_point_sample: sampling_gpu.cu:69-229 — always seeds index 0,
    carries a running min-distance array (init 1e10, sampling.cpp:74-76),
    and (votenet quirk) never selects points with |p|^2 <= 1e-3
    (sampling_gpu.cu:100-101). Argmax tie-break here is lowest-index-wins
    (the CUDA tree reduction's tie-break depends on the thread stride and is
    effectively unspecified; ties are measure-zero on float data).
  - gather_points: sampling_gpu.cu:8-57 — a plain index gather; the backward
    is a scatter-add (atomicAdd there, deterministic XLA scatter-add here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _on_tpu() -> bool:
    from pointnet2_scannet_tpu.ops.common import on_tpu_backend

    return on_tpu_backend()


@functools.partial(
    jax.jit, static_argnames=("npoint", "skip_near_origin", "use_pallas")
)
def furthest_point_sample(
    xyz: jnp.ndarray,
    npoint: int,
    *,
    skip_near_origin: bool = True,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Iterative furthest-point sampling.

    Args:
      xyz: (B, N, 3) float32 coordinates.
      npoint: number of samples (static).
      skip_near_origin: replicate the reference's |p|^2 <= 1e-3 skip
        (sampling_gpu.cu:100-101). Points inside that ball are never selected
        (beyond the forced seed index 0). The published checkpoints were
        trained with this behavior.
      use_pallas: force/forbid the Pallas TPU kernel; None = auto (Pallas on
        TPU backends, XLA elsewhere).

    Returns:
      (B, npoint) int32 indices into N. Not differentiable (index output).
    """
    if use_pallas is None:
        from pointnet2_scannet_tpu.ops.tuning import ops_config

        use_pallas = (
            ops_config.fps_pallas if ops_config.fps_pallas is not None else _on_tpu()
        )
    # the Pallas kernel wants points filling whole 128-wide lanes; tiny or
    # ragged N (e.g. the 64->16 SA level) runs the XLA path instead
    if xyz.shape[1] % 128 != 0:
        use_pallas = False
    if use_pallas:
        try:
            from pointnet2_scannet_tpu.ops.pallas import fps_kernel

            return fps_kernel.furthest_point_sample_pallas(
                xyz, npoint, skip_near_origin=skip_near_origin
            )
        except ImportError:  # pragma: no cover - kernel not available
            pass

    B, N, _ = xyz.shape
    # distances compute in f32 (the CUDA contract dtype) for every narrower
    # input; an f64 input keeps f64 so high-precision parity tests can hold
    # the whole forward in doubles (tests/test_reference_eval_parity.py)
    dt = xyz.dtype if xyz.dtype == jnp.float64 else jnp.float32
    xyz = xyz.astype(dt)
    sq = jnp.sum(xyz * xyz, axis=-1)  # (B, N)
    if skip_near_origin:
        valid = sq > 1e-3
    else:
        valid = jnp.ones((B, N), bool)

    def body(j, carry):
        mind, last, idxs = carry
        p = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - p) ** 2, axis=-1)  # (B,N)
        mind = jnp.minimum(mind, d)
        cand = jnp.where(valid, mind, jnp.asarray(-1.0, dt))
        best = jnp.argmax(cand, axis=-1).astype(jnp.int32)  # first max on ties
        idxs = lax.dynamic_update_slice(idxs, best[:, None], (0, j))
        return mind, best, idxs

    idxs0 = jnp.zeros((B, npoint), jnp.int32)
    init = (jnp.full((B, N), 1e10, dt), jnp.zeros((B,), jnp.int32), idxs0)
    _, _, idxs = lax.fori_loop(1, npoint, body, init)
    return idxs


def gather_points(
    points: jnp.ndarray, idx: jnp.ndarray, *, use_mxu: bool | None = None
) -> jnp.ndarray:
    """Gather rows of a per-point array by index.

    Channels-last counterpart of the reference gather_points
    (sampling_gpu.cu:8-30, which is (B, C, N) × (B, M) → (B, C, M)).
    Runs as one-hot MXU matmuls on TPU when shapes allow (see group_points).

    Args:
      points: (B, N, C) features (or (B, N, 3) coordinates).
      idx: (B, M) int32 indices into N.

    Returns:
      (B, M, C). Differentiable w.r.t. points (deterministic backward).
    """
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    # explicit use_mxu=True pins the MXU kernel, explicit False pins the
    # plain XLA gather (no custom kernel at all); only None auto-selects
    use_vmem = use_mxu is None and (
        ops_config.vmem_gather
        if ops_config.vmem_gather is not None
        else _on_tpu()
    )
    if use_vmem:
        from pointnet2_scannet_tpu.ops.pallas import vmem_gather_kernel

        if vmem_gather_kernel.supported(points, idx.shape[1]):
            return vmem_gather_kernel.vmem_gather_any(points, idx)
    if use_mxu is None:
        use_mxu = (
            ops_config.mxu_gather if ops_config.mxu_gather is not None else _on_tpu()
        )
    if use_mxu:
        from pointnet2_scannet_tpu.ops.pallas import gather_kernel

        if gather_kernel.supported(points, idx.shape[1]):
            return gather_kernel.mxu_gather(points, idx)
    return jnp.take_along_axis(points, idx[..., None], axis=1)
