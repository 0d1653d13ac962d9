"""Ball query, grouping, and the query-and-group fusion.

Contract matched against the reference:
  - ball_query: ball_query_gpu.cu:9-54 — for each query, scan points in
    original index order and keep the FIRST `nsample` with d^2 < r^2; the row
    is pre-filled with the first hit (so short rows are padded with the first
    neighbor, :34-38); a query with no neighbor keeps the zero-initialized row
    (ball_query.cpp:19-21) and therefore silently groups point 0.
  - group_points: group_points_gpu.cu:8-75 — a gather along N with scatter-add
    backward.
  - query_and_group / group_all: the Python-side QueryAndGroup / GroupAll
    (pointnet2_utils.py:294-424): group xyz, subtract the centroid, optionally
    normalize by the radius, concat grouped features ([xyz | feats] order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from pointnet2_scannet_tpu.ops.common import on_tpu_backend, pairwise_sqdist


def _on_tpu() -> bool:
    return on_tpu_backend()


def ball_query(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    *,
    dist_mode: str = "exact",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Fixed-radius neighborhood query with reference-exact padding semantics.

    Args:
      radius: ball radius (static).
      nsample: max neighbors per query (static).
      xyz: (B, N, 3) all points.
      new_xyz: (B, M, 3) query centroids.
      use_pallas: force/forbid the fused Pallas TPU kernel (3.2x the XLA
        top_k path at the SSG levels); None = auto on TPU backends when the
        shapes are lane-aligned.

    Returns:
      (B, M, nsample) int32 indices into N: the first `nsample` in-radius
      points in ascending index order, rows padded with the first hit, or
      all-zero when the ball is empty.
    """
    N = xyz.shape[1]
    M = new_xyz.shape[1]
    if use_pallas is None:
        from pointnet2_scannet_tpu.ops.tuning import ops_config

        use_pallas = (
            ops_config.ball_query_pallas
            if ops_config.ball_query_pallas is not None
            else _on_tpu()
        )
    if use_pallas and N % 128 == 0 and (M <= 128 or M % 128 == 0):
        from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
            _auto_tile_m,
            ball_query_pallas,
        )

        # an odd M can't be halved below the VMEM envelope (e.g. M=75 at
        # N=32768 leaves a ~9 MB distance tile) — fall back to XLA then
        if _auto_tile_m(M, N) * N <= 128 * 8192:
            return ball_query_pallas(float(radius), int(nsample), xyz, new_xyz)
    d2 = pairwise_sqdist(new_xyz, xyz, mode=dist_mode)  # (B, M, N)
    # radius^2 in the distance dtype: identical bits in f32 production, and
    # under f64 it matches a double-precision reference's radius*radius
    # (an f32-rounded constant promoted to f64 would misclassify d2 values
    # inside the ~3e-9 band between the two constants)
    valid = d2 < jnp.asarray(radius, d2.dtype) ** 2
    iota = lax.broadcasted_iota(jnp.int32, d2.shape, 2)
    masked = jnp.where(valid, iota, N)
    # smallest `nsample` indices == negated top_k of the negated indices
    # (lax.top_k is stable: equal keys come out in ascending index order).
    neg_top, _ = lax.top_k(-masked, nsample)
    idx = -neg_top  # (B, M, nsample), ascending; N marks "no hit"
    found = idx < N
    first = idx[..., :1]
    fill = jnp.where(first < N, first, 0)
    return jnp.where(found, idx, fill).astype(jnp.int32)


def group_points(
    points: jnp.ndarray, idx: jnp.ndarray, *, use_mxu: bool | None = None
) -> jnp.ndarray:
    """Gather per-point features into neighborhoods.

    Channels-last counterpart of group_points (group_points_gpu.cu:8-33,
    (B, C, N) × (B, M, K) → (B, C, M, K)).

    On TPU the gather runs as one-hot MXU matmuls (ops/pallas/gather_kernel)
    when shapes allow — XLA's native gather is ~1 GB/s effective for the tiny
    3-9 float rows point-cloud grouping produces, and its scatter-add
    transpose is worse.

    Args:
      points: (B, N, C).
      idx: (B, M, K) int32 indices into N.

    Returns:
      (B, M, K, C). Differentiable w.r.t. points (deterministic backward).
    """
    B, M, K = idx.shape
    flat = idx.reshape(B, M * K)
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

        if vmem_gather_kernel.supported(points, M * K):
            out = vmem_gather_kernel.vmem_gather_any(points, flat)
            return out.reshape(B, M, K, points.shape[-1])
    if use_mxu is None:
        use_mxu = (
            ops_config.mxu_gather if ops_config.mxu_gather is not None else _on_tpu()
        )
    if use_mxu:
        from pointnet2_scannet_tpu.ops.pallas import gather_kernel

        if gather_kernel.supported(points, M * K):
            out = gather_kernel.mxu_gather(points, flat)
            return out.reshape(B, M, K, points.shape[-1])
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(B, M, K, points.shape[-1])


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    dist_mode: str = "exact",
) -> jnp.ndarray:
    """Ball-query then group, centering grouped xyz on the query point.

    Mirrors QueryAndGroup.forward (pointnet2_utils.py:334-377): grouped xyz
    minus centroid (:350), optional /radius normalization (:352), concat
    [xyz, features] on the channel axis (:358-366).

    Returns:
      (B, M, nsample, 3 + C) if use_xyz and features is not None;
      (B, M, nsample, 3) or (B, M, nsample, C) otherwise.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz, dist_mode=dist_mode)
    return group_with_idx(
        idx, xyz, new_xyz, features,
        use_xyz=use_xyz, normalize_xyz=normalize_xyz, radius=radius,
    )


@jax.custom_vjp
def split2_bf16(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f32 -> (hi, lo) bf16 with hi + lo capturing the top 16 mantissa bits
    (truncation split: hi is literally x's top 16 float32 bits).

    VJP: hi = trunc(x) is piecewise constant (derivative 0 a.e.) and
    lo = x - trunc(x) has derivative 1 a.e., so dx = d(lo) ALONE — summing
    both cotangents would double-count when the caller re-adds hi + lo (the
    intended use), since both parts then carry the same cotangent."""
    from pointnet2_scannet_tpu.ops.pallas.gather_kernel import _trunc_bf16

    hi = _trunc_bf16(x)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split2_fwd(x):
    return split2_bf16(x), None


def _split2_bwd(_, g):
    _, glo = g
    return (glo.astype(jnp.float32),)


split2_bf16.defvjp(_split2_fwd, _split2_bwd)


def group_with_idx(
    idx: jnp.ndarray,
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    radius: float = 1.0,
) -> jnp.ndarray:
    """The grouping half of query_and_group, for callers that computed the
    neighbor indices themselves (e.g. the fused multi-radius ball query)."""
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    group = group_points_segsum if ops_config.group_segsum else group_points
    if (
        features is not None
        and use_xyz
        and features.dtype == jnp.bfloat16
        and ops_config.packed_bf16_group
    ):
        # bf16 fast path: ONE bf16 gather of [xyz_hi | xyz_lo | feats] packed
        # rows (half the gather/scatter traffic of the f32 path). xyz rides as
        # a 2x-bf16 truncation split (16 mantissa bits, ~1e-4 m absolute at
        # room scale) and is reconstructed + centroid-centered in f32 before
        # the bf16 cast, so the CENTERED coordinates keep bf16's full relative
        # precision instead of inheriting the raw coordinate's quantization.
        hi, lo = split2_bf16(xyz.astype(jnp.float32))
        payload = jnp.concatenate([hi, lo, features], axis=-1)
        grouped = group(payload, idx)
        gxyz = (
            grouped[..., :3].astype(jnp.float32)
            + grouped[..., 3:6].astype(jnp.float32)
            - new_xyz[:, :, None, :]
        )
        if normalize_xyz:
            gxyz = gxyz / radius
        return jnp.concatenate(
            [gxyz.astype(jnp.bfloat16), grouped[..., 6:]], axis=-1
        )
    if features is not None and use_xyz:
        # ONE gather of the concatenated [xyz | features] rows instead of two
        # separate gathers (profiled: the two tiny-row gathers are the SA
        # level's dominant cost; 9-wide rows halve the index overhead)
        both = jnp.concatenate([xyz, features], axis=-1)
        grouped = group(both, idx)
        grouped_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
        if normalize_xyz:
            grouped_xyz = grouped_xyz / radius
        return jnp.concatenate([grouped_xyz, grouped[..., 3:]], axis=-1)
    if features is not None:  # use_xyz=False: only the feature gather runs
        return group(features, idx)
    if not use_xyz:
        raise ValueError("cannot have not features and not use xyz as a feature")
    grouped_xyz = group(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius
    return grouped_xyz


def group_all(
    xyz: jnp.ndarray,
    features: jnp.ndarray | None,
    *,
    use_xyz: bool = True,
) -> jnp.ndarray:
    """Group the entire point set into one neighborhood (GroupAll,
    pointnet2_utils.py:379-424).

    Returns:
      (B, 1, N, 3 + C) (or (B, 1, N, 3) / (B, 1, N, C)).
    """
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_features = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped_xyz, grouped_features], axis=-1)
        return grouped_features
    return grouped_xyz


def unique_neighbor_count(idx: jnp.ndarray) -> jnp.ndarray:
    """Number of distinct neighbors per ball-query row.

    Exploits this ball_query's output invariant: distinct hits form a
    strictly-ascending prefix, padding repeats the first hit. Matches
    torch.unique-based counting in the reference's sample_uniformly path
    (pointnet2_utils.py:46-49), including the ambiguity that an empty ball
    (all-zero row) counts as one unique neighbor.
    """
    increasing = idx[..., 1:] > idx[..., :-1]
    prefix = jnp.cumprod(increasing.astype(jnp.int32), axis=-1)
    return 1 + jnp.sum(prefix, axis=-1)


def uniform_resample_neighbors(
    key, idx: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Replace ball-query padding with uniform draws from each ball's unique
    neighbor set (QueryAndGroup(sample_uniformly=True),
    pointnet2_utils.py:43-52).

    Returns (resampled idx (B, M, K), unique_cnt (B, M)).
    """
    import jax

    B, M, K = idx.shape
    cnt = unique_neighbor_count(idx)  # (B, M)
    slots = lax.broadcasted_iota(jnp.int32, (B, M, K), 2)
    rand = jax.random.randint(key, (B, M, K), 0, 1 << 30)
    pick = rand % cnt[..., None]  # uniform position within the unique prefix
    resampled_vals = jnp.take_along_axis(idx, pick, axis=-1)
    out = jnp.where(slots < cnt[..., None], idx, resampled_vals)
    return out.astype(jnp.int32), cnt.astype(jnp.int32)


@jax.custom_vjp
def group_points_segsum(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """group_points with a sort + segment-sum backward.

    Forward is identical to group_points; the VJP replaces XLA's scatter-add
    (slow on TPU for large non-unique index sets) with: sort the flattened
    indices, sort the cotangent rows the same way, and segment-sum runs of
    equal indices (indices_are_sorted=True fast path).
    """
    return group_points(points, idx)


def _gps_fwd(points, idx):
    return group_points(points, idx), (points.shape, idx)


def _gps_bwd(res, g):
    (B, N, C), idx = res
    M, K = idx.shape[1], idx.shape[2]
    flat_idx = idx.reshape(B, M * K)
    flat_g = g.reshape(B, M * K, C)
    order = jnp.argsort(flat_idx, axis=1)
    sorted_idx = jnp.take_along_axis(flat_idx, order, axis=1)
    sorted_g = jnp.take_along_axis(flat_g, order[..., None], axis=1)
    grad_points = jax.vmap(
        lambda si, sg: jax.ops.segment_sum(
            sg, si, num_segments=N, indices_are_sorted=True
        )
    )(sorted_idx, sorted_g)
    return grad_points.astype(g.dtype), None


group_points_segsum.defvjp(_gps_fwd, _gps_bwd)
