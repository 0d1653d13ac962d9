"""PointNet++ shape-classification heads (SSG/MSG).

BEYOND-REFERENCE capability: ero1311/Pointnet2.ScanNet ships only the
semantic-segmentation models, but its module layer is the upstream
PointNet++ one (pointnet2/pointnet2_modules.py), whose lineage pairs the
same SA stack with a global-pooling classifier. This gives users of that
module layer the classification family on TPU, built from the SAME
SetAbstraction / FC blocks the segmentation models use (so every op-level
contract test covers these too).

Hyperparameters follow the standard public PointNet++ classification
recipe: SSG = SA(512, r=0.2, K=32, [64,64,128]) -> SA(128, r=0.4, K=64,
[128,128,256]) -> SA(group_all, [256,512,1024]) -> FC 512 -> FC 256 ->
logits, dropout 0.5; MSG widens the first two levels to three radii each.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from pointnet2_scannet_tpu.models.layers import FC
from pointnet2_scannet_tpu.models.modules import SetAbstraction


@dataclasses.dataclass(frozen=True)
class PointNet2ClsSpec:
    """One SA tower + FC head. Each SA level: (npoint|None, radii, ks, mlps)."""

    sa_levels: tuple
    fc_widths: tuple = (512, 256)
    dropout: float = 0.5


def cls_ssg_spec() -> PointNet2ClsSpec:
    return PointNet2ClsSpec(
        sa_levels=(
            (512, (0.2,), (32,), ((64, 64, 128),)),
            (128, (0.4,), (64,), ((128, 128, 256),)),
            (None, (), (), ((256, 512, 1024),)),
        )
    )


def cls_msg_spec() -> PointNet2ClsSpec:
    return PointNet2ClsSpec(
        sa_levels=(
            (
                512,
                (0.1, 0.2, 0.4),
                (16, 32, 128),
                ((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            ),
            (
                128,
                (0.2, 0.4, 0.8),
                (32, 64, 128),
                ((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            ),
            (None, (), (), ((256, 512, 1024),)),
        )
    )


class PointNet2Cls(nn.Module):
    """(B, N, 3 + C) point clouds -> (B, num_classes) logits.

    Same input convention as PointNet2SemSeg: columns 0:3 are xyz, the rest
    ride as per-point features. The final SA level group-alls into one
    global vector per cloud; the FC head applies BN + ReLU + dropout
    between linear layers (dropout only when train=True).
    """

    num_classes: int
    spec: PointNet2ClsSpec
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
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        if self.dtype is not None:
            xyz = xyz.astype(self.dtype)
            features = None if features is None else features.astype(self.dtype)

        for i, (npoint, radii, ks, mlps) in enumerate(self.spec.sa_levels):
            xyz, features, _ = SetAbstraction(
                npoint=npoint,
                radii=radii,
                nsamples=ks,
                mlps=mlps,
                use_xyz=self.use_xyz,
                bn=self.bn,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"sa{i + 1}",
            )(xyz, features, train=train, bn_momentum=bn_momentum)

        x = features.reshape(features.shape[0], -1)  # (B, 1024) global vector
        for j, width in enumerate(self.spec.fc_widths):
            x = FC(
                out_size=width, bn=self.bn, dtype=self.dtype, name=f"fc{j + 1}"
            )(x, train=train, bn_momentum=bn_momentum)
            x = nn.Dropout(rate=self.spec.dropout, deterministic=not train)(x)
        logits = FC(
            out_size=self.num_classes,
            bn=False,
            activation=False,
            dtype=self.dtype,
            name="head",
        )(x, train=train)
        return logits.astype(jnp.float32)


def get_cls_model(
    num_classes: int,
    is_msg: bool = False,
    *,
    use_xyz: bool = True,
    bn: bool = True,
    dtype: jnp.dtype | None = None,
    bn_axis_name: str | None = None,
) -> PointNet2Cls:
    return PointNet2Cls(
        num_classes=num_classes,
        spec=cls_msg_spec() if is_msg else cls_ssg_spec(),
        use_xyz=use_xyz,
        bn=bn,
        dtype=dtype,
        bn_axis_name=bn_axis_name,
    )
