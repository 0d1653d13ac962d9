"""PointNet++ part-segmentation heads (SSG/MSG).

BEYOND-REFERENCE capability: ero1311/Pointnet2.ScanNet ships only scene
semantic segmentation, but its module layer is the upstream PointNet++ one
(pointnet2/pointnet2_modules.py) whose lineage also pairs SA towers + FP
decoders with an object-category-conditioned per-point part classifier
(ShapeNet-part style). This completes the classic PointNet++ triple
(classification / part segmentation / semantic segmentation) on TPU from
the SAME SetAbstraction / FeaturePropagation / PointwiseMLP blocks.

Hyperparameters follow the standard public PointNet++ part-seg recipe:
  SSG: SA(512, r=0.2, K=32, [64,64,128]) -> SA(128, r=0.4, K=64,
  [128,128,256]) -> SA(group_all, [256,512,1024]); FP [256,256] ->
  [256,128] -> [128,128,128]; head Conv(128)+Dropout(0.5)+Conv(num_parts).
  MSG widens the first two SA levels to multi-radius.
The object-category one-hot is injected at the LAST FP level's skip
(concatenated with the raw xyz), as in that lineage.

Input convention: the category one-hot rides as the LAST num_categories
per-point feature channels of the input cloud (constant across each cloud's
points), so the engine's shape-generic train/eval steps (engine/
train_state.py) drive this family unchanged — the model strips those
channels off the SA feature stack and re-injects them at the final FP skip.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from pointnet2_scannet_tpu.models.layers import PointwiseMLP
from pointnet2_scannet_tpu.models.modules import FeaturePropagation, SetAbstraction


@dataclasses.dataclass(frozen=True)
class PointNet2PartSegSpec:
    """SA tower (npoint|None, radii, ks, mlps) + FP decoder + head."""

    sa_levels: tuple
    fp_mlps: tuple  # deepest-first: fp_mlps[0] refines the coarsest skip
    head_width: int = 128
    dropout: float = 0.5


def partseg_ssg_spec() -> PointNet2PartSegSpec:
    return PointNet2PartSegSpec(
        sa_levels=(
            (512, (0.2,), (32,), ((64, 64, 128),)),
            (128, (0.4,), (64,), ((128, 128, 256),)),
            (None, (), (), ((256, 512, 1024),)),
        ),
        fp_mlps=((256, 256), (256, 128), (128, 128, 128)),
    )


def partseg_msg_spec() -> PointNet2PartSegSpec:
    return PointNet2PartSegSpec(
        sa_levels=(
            (
                512,
                (0.1, 0.2, 0.4),
                (32, 64, 128),
                ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            ),
            (
                128,
                (0.4, 0.8),
                (64, 128),
                ((128, 128, 256), (128, 196, 256)),
            ),
            (None, (), (), ((256, 512, 1024),)),
        ),
        fp_mlps=((256, 256), (256, 128), (128, 128)),
    )


class PointNet2PartSeg(nn.Module):
    """(B, N, 3 + C + num_categories) -> (B, N, num_parts) logits.

    Columns 0:3 are xyz, then C ordinary per-point features, then the
    num_categories one-hot (constant per cloud). The one-hot bypasses the
    SA tower and joins the last FP level's skip features together with the
    raw xyz, conditioning every point on the object category.
    """

    num_parts: int
    num_categories: int
    spec: PointNet2PartSegSpec
    use_xyz: bool = True
    bn: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        pointcloud: jnp.ndarray,
        train: bool = False,
        bn_momentum=None,
    ) -> jnp.ndarray:
        k = self.num_categories
        assert pointcloud.shape[-1] >= 3 + k, (
            f"expected >= {3 + k} channels (xyz + features + {k} one-hot), "
            f"got {pointcloud.shape[-1]}"
        )
        xyz = pointcloud[..., :3]
        cls_onehot = pointcloud[..., -k:]
        features = pointcloud[..., 3:-k] if pointcloud.shape[-1] > 3 + k else None
        if self.dtype is not None:
            xyz = xyz.astype(self.dtype)
            cls_onehot = cls_onehot.astype(self.dtype)
            features = None if features is None else features.astype(self.dtype)

        l_xyz = [xyz]
        l_feats = [features]
        for i, (npoint, radii, ks, mlps) in enumerate(self.spec.sa_levels):
            new_xyz, new_feats, _ = SetAbstraction(
                npoint=npoint,
                radii=radii,
                nsamples=ks,
                mlps=mlps,
                use_xyz=self.use_xyz,
                bn=self.bn,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"sa{i + 1}",
            )(l_xyz[i], l_feats[i], train=train, bn_momentum=bn_momentum)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)

        # the final FP skip carries [category one-hot, raw xyz, input feats]
        # (the torch lineage's torch.cat([cls_label_one_hot, l0_xyz, l0_points]))
        skip0 = [cls_onehot, xyz]
        if features is not None:
            skip0.append(features)
        l_feats[0] = jnp.concatenate(skip0, axis=-1)

        n_levels = len(self.spec.sa_levels)
        for j, mlp in enumerate(self.spec.fp_mlps):
            lvl = n_levels - 1 - j  # deepest skip first
            # the coarsest SA level is group_all: SetAbstraction returns
            # new_xyz=None there and FeaturePropagation's known=None path
            # broadcasts the global feature onto every point
            known = l_xyz[lvl + 1]
            l_feats[lvl] = FeaturePropagation(
                mlp=mlp,
                bn=self.bn,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"fp{lvl + 1}",
            )(l_xyz[lvl], known, l_feats[lvl], l_feats[lvl + 1], train, bn_momentum)

        h = PointwiseMLP(
            (self.spec.head_width,),
            bn=self.bn,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="head_fc",
        )(l_feats[0], train, bn_momentum)
        h = nn.Dropout(rate=self.spec.dropout, deterministic=not train)(h)
        logits = PointwiseMLP(
            (self.num_parts,),
            bn=False,
            last_act=False,
            dtype=self.dtype,
            name="head_out",
        )(h, train, bn_momentum)
        return logits.astype(jnp.float32)


def get_partseg_model(
    num_parts: int,
    num_categories: int,
    is_msg: bool = False,
    *,
    use_xyz: bool = True,
    bn: bool = True,
    dtype: jnp.dtype | None = None,
    bn_axis_name: str | None = None,
) -> PointNet2PartSeg:
    return PointNet2PartSeg(
        num_parts=num_parts,
        num_categories=num_categories,
        spec=partseg_msg_spec() if is_msg else partseg_ssg_spec(),
        use_xyz=use_xyz,
        bn=bn,
        dtype=dtype,
        bn_axis_name=bn_axis_name,
    )
