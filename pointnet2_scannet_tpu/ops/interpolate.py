"""3-nearest-neighbor search and inverse-distance feature interpolation.

Contract matched against the reference:
  - three_nn: interpolate_gpu.cu:9-68 — brute-force O(n*m) running top-3 with
    strict-< insertion (earliest index wins ties). Returns SQUARED distances;
    the Python wrapper takes the sqrt (pointnet2_utils.py:142) — here the
    module layer does.
  - three_interpolate: interpolate_gpu.cu:72-154 — out[j] = sum_i w_i *
    feats[idx_i]; backward is a scatter-add (atomicAdd there, deterministic
    here via XLA gather transpose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pointnet2_scannet_tpu.ops.common import on_tpu_backend, pairwise_sqdist


def three_nn(
    unknown: jnp.ndarray,
    known: jnp.ndarray,
    *,
    dist_mode: str = "exact",
    use_pallas: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Three nearest neighbors of each `unknown` point among `known` points.

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3), m >= 3.
      use_pallas: force/forbid the fused Pallas TPU kernel; None = auto on
        TPU backends when m fills whole 128-wide lanes.

    Returns:
      (dist2, idx): (B, n, 3) squared distances (ascending) and int32 indices.
      Both lowerings tie-break to the lowest index, matching the CUDA
      kernel's strict-< insertion order.
    """
    n, m = unknown.shape[1], known.shape[1]
    if use_pallas is None:
        from pointnet2_scannet_tpu.ops.tuning import ops_config

        if ops_config.three_nn_pallas is not None:
            use_pallas = ops_config.three_nn_pallas
        else:
            use_pallas = on_tpu_backend()
    if use_pallas and n % 128 == 0 and m % 8 == 0:
        # transposed (known-major) kernel: measured 3.0 ms vs 5.3 for the
        # query-major kernel at the FP1 shape (scripts/bench_fp.py --three_nn)
        from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import (
            three_nn_pallas_t,
        )

        tile_n = min(n, 512)
        # 4 live (m, tile_n) f32 buffers; keep them within ~8 MB of VMEM.
        # If even tile_n=128 busts the budget (m > 4096), skip the kernel —
        # oversubscribed VMEM fails at compile/run time on the chip.
        while tile_n > 128 and m * tile_n * 16 > 8 * 1024 * 1024:
            tile_n //= 2
        if n % tile_n == 0 and m * tile_n * 16 <= 8 * 1024 * 1024:
            return three_nn_pallas_t(unknown, known, tile_n=tile_n)
    if use_pallas and m % 128 == 0 and n % min(n, 256) == 0:
        from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import three_nn_pallas

        return three_nn_pallas(unknown, known)
    d2 = pairwise_sqdist(unknown, known, mode=dist_mode)  # (B, n, m)
    neg, idx = lax.top_k(-d2, 3)
    return -neg, idx.astype(jnp.int32)


def three_interpolate(
    points: jnp.ndarray,
    idx: jnp.ndarray,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    """Weighted interpolation of features from 3 neighbors.

    Channels-last counterpart of three_interpolate (interpolate_gpu.cu:72-113,
    (B, C, m) × (B, n, 3) × (B, n, 3) → (B, C, n)).

    Args:
      points: (B, m, C) source features.
      idx: (B, n, 3) neighbor indices into m.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C). Differentiable w.r.t. points and weight.
    """
    gathered = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(gathered * weight[..., None], axis=2)


def _dense_operator(idx: jnp.ndarray, weight: jnp.ndarray, m: int) -> jnp.ndarray:
    """The sparse interpolation operator W (B, n, m) built densely: 3
    one-hot-weighted nonzeros per row."""
    B, n, _ = idx.shape
    cols = lax.broadcasted_iota(jnp.int32, (B, n, 1, m), 3)
    onehot = (cols == idx[..., :, None]).astype(weight.dtype)  # (B,n,3,m)
    return jnp.einsum("bnk,bnkm->bnm", weight, onehot)


@jax.custom_vjp
def three_interpolate_fast(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """three_interpolate with the reference's exact differentiability: the
    backward produces grad_features ONLY (the CUDA ThreeInterpolate.backward
    returns (grad_features, None, None), pointnet2_utils.py:188-206; weight
    never carries gradients because three_nn is non-differentiable).

    Forward: VMEM chunk-select gather of the 3 neighbor rows (+ weighted
    sum). Backward: dense W^T @ g MXU matmul (scatter-free, same as
    three_interpolate_dense's). NOTE: measured SLOWER than the dense path at
    the C=128 FP level (see ops_config.interpolate_fast) — the gather
    kernel's VMEM traffic scales with C*N/128; prefer this only for
    narrow-channel sources.
    """
    return _fast_fwd_value(points, idx, weight)


def _fast_fwd_value(points, idx, weight):
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    B, n, _ = idx.shape
    flat = idx.reshape(B, 3 * n)
    use_vmem = (
        ops_config.vmem_gather
        if ops_config.vmem_gather is not None
        else on_tpu_backend()
    )
    if use_vmem:
        from pointnet2_scannet_tpu.ops.pallas import vmem_gather_kernel as vk

        if vk.supported(points, 3 * n):
            g = vk.vmem_gather_any(
                lax.stop_gradient(points), lax.stop_gradient(flat)
            )
            return jnp.sum(g.reshape(B, n, 3, -1) * weight[..., None], axis=2)
    g = jnp.take_along_axis(points[:, None, :, :], idx[..., None], axis=2)
    return jnp.sum(g * weight[..., None], axis=2)


def _fast_vjp_fwd(points, idx, weight):
    return _fast_fwd_value(points, idx, weight), (
        idx,
        weight,
        points.shape[1],
        jnp.zeros((), points.dtype),  # dtype exemplar for the cotangent cast
    )


def _fast_vjp_bwd(res, g):
    idx, weight, m, pproto = res
    W = _dense_operator(idx, weight.astype(g.dtype), m)
    dpoints = jnp.einsum("bnm,bnc->bmc", W, g)
    return dpoints.astype(pproto.dtype), None, None


three_interpolate_fast.defvjp(_fast_vjp_fwd, _fast_vjp_bwd)


def three_interpolate_dense(
    points: jnp.ndarray,
    idx: jnp.ndarray,
    weight: jnp.ndarray,
) -> jnp.ndarray:
    """three_interpolate as one dense MXU matmul.

    Builds the sparse interpolation operator W (B, n, m) densely from
    one-hot compares (3 nonzeros per row) and contracts it with the source
    features. On TPU this turns BOTH the forward gather and the backward
    scatter-add into matmuls (grad_points = W^T @ g, grad_weight = gathers),
    trading HBM traffic (the (B, n, m) operator) for scatter-free autodiff.
    Prefer for large n*m when the scatter path dominates the backward.
    """
    W = _dense_operator(idx, weight.astype(points.dtype), points.shape[1])
    return jnp.einsum("bnm,bmc->bnc", W, points)


@jax.custom_vjp
def three_interpolate_cached(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Dense-MXU three_interpolate with an explicitly W-CACHING VJP.

    Same forward as three_interpolate_dense, but the (B, n, m) operator W is
    saved as the residual so the backward is ONE einsum (grad_points =
    W^T @ g) with no operator rebuild — under plain autodiff XLA is free to
    rematerialize the one-hot construction inside the backward, which at the
    FP1 shape (B=32, n=8192, m=1024) re-runs ~800M compares. Weight/idx get
    no gradients, the reference's ThreeInterpolate.backward contract
    (pointnet2_utils.py:188-206: grads to features only).

    Residual cost: W is B*n*m floats live from the FP forward to its
    backward; FP1 runs LAST in the forward pass, so its (the biggest) W has
    the shortest live range.
    """
    W = _dense_operator(idx, weight.astype(points.dtype), points.shape[1])
    return jnp.einsum("bnm,bmc->bnc", W, points)


def _cached_vjp_fwd(points, idx, weight):
    W = _dense_operator(idx, weight.astype(points.dtype), points.shape[1])
    out = jnp.einsum("bnm,bmc->bnc", W, points)
    return out, W


def _cached_vjp_bwd(res, g):
    W = res
    return jnp.einsum("bnm,bnc->bmc", W, g.astype(W.dtype)), None, None


three_interpolate_cached.defvjp(_cached_vjp_fwd, _cached_vjp_bwd)
