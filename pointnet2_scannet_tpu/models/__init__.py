"""Flax models: PointNet++ SSG/MSG semantic segmentation heads for ScanNet."""

from pointnet2_scannet_tpu.models.layers import PointwiseMLP
from pointnet2_scannet_tpu.models.modules import SetAbstraction, FeaturePropagation
from pointnet2_scannet_tpu.models.pointnet2 import (
    PointNet2Spec,
    PointNet2SemSeg,
    ssg_spec,
    msg_spec,
    get_model,
)

__all__ = [
    "PointwiseMLP",
    "SetAbstraction",
    "FeaturePropagation",
    "PointNet2Spec",
    "PointNet2SemSeg",
    "ssg_spec",
    "msg_spec",
    "get_model",
]
