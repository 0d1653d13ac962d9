"""Set-abstraction and feature-propagation modules.

TPU-native counterparts of the reference pointnet2_modules.py:
  - SetAbstraction covers both PointnetSAModule (single scale, :127) and
    PointnetSAModuleMSG (multi scale, :78): FPS -> gather centroids -> per
    scale (ball query -> group -> pointwise MLP -> max over the sample axis)
    -> concat scales on channels (:34-75).
  - FeaturePropagation mirrors PointnetFPModule (:356-416): 3-NN
    inverse-distance interpolation (weights (1/d)/sum(1/d), :394-397) ->
    concat skip features -> pointwise MLP.

Everything is channels-last and shape-static; the sample axis is padded by
ball_query's reference semantics, so max-pooling over it is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointnet2_scannet_tpu import ops
from pointnet2_scannet_tpu.models.layers import PointwiseMLP
from pointnet2_scannet_tpu.ops.common import on_tpu_backend


class SetAbstraction(nn.Module):
    """Multi-scale grouping set abstraction (single-scale = one entry)."""

    npoint: int | None  # None => group-all (global abstraction)
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]  # per scale, output widths (input inferred)
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: jnp.ndarray | None,
        train: bool = False,
        bn_momentum=None,
        row_mask: jnp.ndarray | None = None,
    ) -> tuple[jnp.ndarray | None, jnp.ndarray, jnp.ndarray | None]:
        """(B, N, 3), (B, N, C) -> new_xyz (B, npoint, 3), feats (B, npoint, C').

        Returns (new_xyz, new_features, fps_idx), like the reference SA
        forward (pointnet2_modules.py:34-75) which also returns the sampled
        indices.
        """
        if self.npoint is not None:
            idx = ops.furthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, idx)
        else:
            idx = None
            new_xyz = None

        if self.dtype is not None and features is not None:
            # cast raw input features to the compute dtype BEFORE grouping so
            # bf16 models take the packed single-bf16-gather path at SA1 too
            # (the first Dense would cast them anyway)
            features = features.astype(self.dtype)

        idxs = None
        if self.npoint is not None:
            idxs = self._scale_indices(xyz, new_xyz)

        scale_outs = []
        for s, widths in enumerate(self.mlps):
            if self.npoint is not None and self._pregather(features, widths, train):
                # wide-channel fast path: layer-0 Dense at source resolution,
                # gather widths[0] channels instead of 3 + C (the multiview
                # recipes' C=131 vs w0=32; see PointwiseMLPPregather)
                from pointnet2_scannet_tpu.models.layers import (
                    PointwiseMLPPregather,
                )

                h = PointwiseMLPPregather(
                    tuple(widths), bn=self.bn, dtype=self.dtype,
                    bn_axis_name=self.bn_axis_name, name=f"mlp_{s}",
                )(
                    xyz if self.use_xyz else None,
                    features,
                    idxs[s],
                    new_xyz if self.use_xyz else None,
                    train,
                    bn_momentum,
                    row_mask,
                )
            else:
                if self.npoint is not None:
                    from pointnet2_scannet_tpu.ops.neighborhood import group_with_idx

                    grouped = group_with_idx(
                        idxs[s], xyz, new_xyz, features, use_xyz=self.use_xyz
                    )  # (B, M, K, 3 + C)
                else:
                    grouped = ops.group_all(xyz, features, use_xyz=self.use_xyz)
                h = PointwiseMLP(
                    tuple(widths), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name=f"mlp_{s}"
                )(grouped, train, bn_momentum, row_mask)
            # max over the neighborhood/sample axis, like F.max_pool2d over
            # nsample (pointnet2_modules.py:65-71)
            scale_outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(scale_outs, axis=-1), idx

    def _pregather(self, features, widths, train) -> bool:
        """Engage the pregather layer-0 composition? ops_config.pregather_
        dense forces; auto = wide-channel inputs (C_in >= 2 x widths[0]),
        where the win envelope is dtype-dependent (scripts/bench_pregather.py
        at the mv131 recipes):
          - f32: always — the fwd gather saving (62.6 -> 29.6 ms at SA1)
            outweighs the backward's new dz scatter (train step 91.4 -> 76.3
            ms SSG, 130.3 -> 100.4 MSG);
          - bf16: eval only — the packed-bf16 grouping already halves the fwd
            gather, so in training the dz scatter wins out (54.9 -> 61.8 ms
            step, a LOSS), while the forward-only composition still wins
            (33.4 -> 24.8 ms at SA1);
          - f64: never — the parity suites pin the reference-exact
            composition there."""
        if features is None:
            return False
        from pointnet2_scannet_tpu.ops.tuning import ops_config

        if ops_config.pregather_dense is not None:
            return ops_config.pregather_dense
        c_in = features.shape[-1] + (3 if self.use_xyz else 0)
        if c_in < 2 * widths[0]:
            return False
        if features.dtype == jnp.float32:
            return True
        return features.dtype == jnp.bfloat16 and not train

    def _scale_indices(self, xyz, new_xyz):
        """Ball-query indices per scale; MSG's two scales share one fused
        kernel (the distance tile is computed once) on TPU-aligned shapes."""
        import jax

        N, M = xyz.shape[1], new_xyz.shape[1]
        # M >= 256: at MSG-SA3 (N=256, M=64) the fused kernel measured ~2.5x
        # slower than 2x single queries (DESIGN.md §MSG hot-op table) — the
        # shared distance tile can't pay for itself on sub-tile query counts.
        aligned = N % 128 == 0 and M % 256 == 0
        if (
            len(self.radii) == 2
            and aligned
            and on_tpu_backend()
        ):
            from pointnet2_scannet_tpu.ops.pallas.ball_query_kernel import (
                ball_query_multi_pallas,
            )

            return list(
                ball_query_multi_pallas(
                    tuple(float(r) for r in self.radii),
                    tuple(int(k) for k in self.nsamples),
                    xyz,
                    new_xyz,
                )
            )
        return [
            ops.ball_query(float(r), int(k), xyz, new_xyz)
            for r, k in zip(self.radii, self.nsamples)
        ]


class FeaturePropagation(nn.Module):
    """Upsample features from a coarse set onto a dense set."""

    mlp: Sequence[int]
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        unknown: jnp.ndarray,
        known: jnp.ndarray | None,
        unknown_feats: jnp.ndarray | None,
        known_feats: jnp.ndarray,
        train: bool = False,
        bn_momentum=None,
        row_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """(B, n, 3), (B, m, 3), (B, n, C1), (B, m, C2) -> (B, n, mlp[-1])."""
        if known is not None:
            from pointnet2_scannet_tpu.ops.interpolate import three_interpolate_dense
            from pointnet2_scannet_tpu.ops.tuning import ops_config

            dist2, idx = ops.three_nn(unknown, known)
            dist = jnp.sqrt(dist2)  # wrapper sqrt, pointnet2_utils.py:142
            dist_recip = 1.0 / (dist + 1e-8)  # pointnet2_modules.py:395
            norm = jnp.sum(dist_recip, axis=2, keepdims=True)
            weight = dist_recip / norm
            import jax

            from pointnet2_scannet_tpu.ops.interpolate import (
                three_interpolate_fast,
            )

            on_tpu = on_tpu_backend()
            use_fast = ops_config.interpolate_fast
            if use_fast is None:
                use_fast = on_tpu
            if use_fast:
                interpolated = three_interpolate_fast(known_feats, idx, weight)
            elif ops_config.interpolate_cached:
                from pointnet2_scannet_tpu.ops.interpolate import (
                    three_interpolate_cached,
                )

                interpolated = three_interpolate_cached(known_feats, idx, weight)
            else:
                use_dense = ops_config.interpolate_dense
                if use_dense is None:
                    use_dense = on_tpu
                interp = (
                    three_interpolate_dense if use_dense else ops.three_interpolate
                )
                interpolated = interp(known_feats, idx, weight)
        else:
            # broadcast a global feature onto every point
            # (pointnet2_modules.py:404-406)
            interpolated = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )

        if unknown_feats is not None:
            h = jnp.concatenate([interpolated, unknown_feats], axis=-1)
        else:
            h = interpolated
        return PointwiseMLP(tuple(self.mlp), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="mlp")(h, train, bn_momentum, row_mask)


class SetAbstractionVotes(nn.Module):
    """Votes-style single-scale SA (the reference's PointnetSAModuleVotes,
    pointnet2_modules.py:164-273): optionally takes precomputed sample
    indices (for vote supervision), supports max/avg/rbf pooling over the
    neighborhood, radius-normalized grouped xyz, uniform neighbor
    re-sampling, and returning the per-ball unique-neighbor counts. Unused by
    the ScanNet segmentation pipeline; provided for votenet-style heads.
    """

    mlp: Sequence[int]
    npoint: int | None = None
    radius: float | None = None
    nsample: int | None = None
    bn: bool = True
    use_xyz: bool = True
    pooling: str = "max"  # "max" | "avg" | "rbf"
    sigma: float | None = None  # rbf bandwidth; default radius/2 (ref :192)
    normalize_xyz: bool = False
    sample_uniformly: bool = False
    ret_unique_cnt: bool = False
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: jnp.ndarray | None = None,
        inds: jnp.ndarray | None = None,
        train: bool = False,
        bn_momentum=None,
    ):
        from pointnet2_scannet_tpu.ops.neighborhood import (
            uniform_resample_neighbors,
            unique_neighbor_count,
        )

        if self.npoint is not None:
            if inds is None:
                inds = ops.furthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, inds)
            idx = ops.ball_query(float(self.radius), int(self.nsample), xyz, new_xyz)
            unique_cnt = None
            if self.sample_uniformly or self.ret_unique_cnt:
                if self.sample_uniformly:
                    key = self.make_rng("sample")
                    idx, unique_cnt = uniform_resample_neighbors(key, idx)
                else:
                    unique_cnt = unique_neighbor_count(idx)
            grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
            if self.normalize_xyz:
                grouped_xyz = grouped_xyz / self.radius
            if features is not None:
                grouped_feats = ops.group_points(features, idx)
                grouped = (
                    jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
                    if self.use_xyz
                    else grouped_feats
                )
            else:
                grouped = grouped_xyz
        else:
            new_xyz = None
            unique_cnt = None
            grouped = ops.group_all(xyz, features, use_xyz=self.use_xyz)
            grouped_xyz = xyz[:, None, :, :]

        h = PointwiseMLP(tuple(self.mlp), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="mlp")(
            grouped, train, bn_momentum
        )
        if self.pooling == "max":
            pooled = jnp.max(h, axis=2)
        elif self.pooling == "avg":
            pooled = jnp.mean(h, axis=2)
        elif self.pooling == "rbf":
            # RBF-weighted sum normalized by nsample (ref :265-267)
            sigma = self.sigma if self.sigma is not None else self.radius / 2.0
            rbf = jnp.exp(
                -jnp.sum(grouped_xyz**2, axis=-1) / (sigma**2) / 2.0
            )  # (B, M, K)
            pooled = jnp.sum(h * rbf[..., None], axis=2) / float(self.nsample)
        else:
            raise ValueError(f"unknown pooling {self.pooling!r}")

        if self.ret_unique_cnt:
            return new_xyz, pooled, inds, unique_cnt
        return new_xyz, pooled, inds


class SetAbstractionMSGVotes(nn.Module):
    """Multi-scale SA with vote-supervision support (the reference's
    PointnetSAModuleMSGVotes, pointnet2_modules.py:274-353): like
    SetAbstraction but accepts precomputed sample indices and optional
    uniform neighbor re-sampling; returns (new_xyz, feats, inds). Unused by
    the ScanNet segmentation pipeline; provided for votenet-style heads."""

    npoint: int | None
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    bn: bool = True
    sample_uniformly: bool = False
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: jnp.ndarray | None = None,
        inds: jnp.ndarray | None = None,
        train: bool = False,
        bn_momentum=None,
    ):
        from pointnet2_scannet_tpu.ops.neighborhood import (
            group_with_idx,
            uniform_resample_neighbors,
        )

        if self.npoint is not None:
            if inds is None:
                inds = ops.furthest_point_sample(xyz, self.npoint)
            new_xyz = ops.gather_points(xyz, inds)
        else:
            new_xyz = None

        scale_outs = []
        for s, widths in enumerate(self.mlps):
            if self.npoint is not None:
                idx = ops.ball_query(
                    float(self.radii[s]), int(self.nsamples[s]), xyz, new_xyz
                )
                if self.sample_uniformly:
                    idx, _ = uniform_resample_neighbors(self.make_rng("sample"), idx)
                grouped = group_with_idx(
                    idx, xyz, new_xyz, features, use_xyz=self.use_xyz
                )
            else:
                grouped = ops.group_all(xyz, features, use_xyz=self.use_xyz)
            h = PointwiseMLP(
                tuple(widths), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name=f"mlp_{s}"
            )(grouped, train, bn_momentum)
            scale_outs.append(jnp.max(h, axis=2))
        return new_xyz, jnp.concatenate(scale_outs, axis=-1), inds


class LearnableFeaturePropagationMSG(nn.Module):
    """Learnable multi-scale feature propagation (the reference's
    PointnetLFPModuleMSG, pointnet2_modules.py:418-496): propagate features1
    (at xyz1) onto xyz2 by ball-query grouping per scale -> MLP -> max-pool,
    concat the target set's own features2, then a post-MLP SHARED across
    scales (the reference applies one self.post_mlp inside the scale loop);
    scale outputs concatenate on channels."""

    mlps: Sequence[Sequence[int]]
    radii: Sequence[float]
    nsamples: Sequence[int]
    post_mlp: Sequence[int]
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz2: jnp.ndarray,
        xyz1: jnp.ndarray,
        features2: jnp.ndarray | None,
        features1: jnp.ndarray | None,
        train: bool = False,
        bn_momentum=None,
    ) -> jnp.ndarray:
        """(B, N2, 3), (B, N1, 3), (B, N2, C2), (B, N1, C1) -> (B, N2, C')."""
        from pointnet2_scannet_tpu.ops.neighborhood import group_with_idx

        post = PointwiseMLP(
            tuple(self.post_mlp), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="post_mlp"
        )
        scale_outs = []
        for s, widths in enumerate(self.mlps):
            idx = ops.ball_query(
                float(self.radii[s]), int(self.nsamples[s]), xyz1, xyz2
            )
            grouped = group_with_idx(idx, xyz1, xyz2, features1, use_xyz=self.use_xyz)
            h = PointwiseMLP(
                tuple(widths), bn=self.bn, dtype=self.dtype, bn_axis_name=self.bn_axis_name, name=f"mlp_{s}"
            )(grouped, train, bn_momentum)
            h = jnp.max(h, axis=2)  # (B, N2, widths[-1])
            if features2 is not None:
                h = jnp.concatenate([h, features2], axis=-1)
            scale_outs.append(post(h, train, bn_momentum))
        return jnp.concatenate(scale_outs, axis=-1)
