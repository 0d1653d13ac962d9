"""Flax models: PointNet++ SSG/MSG semantic segmentation heads for ScanNet."""

from pointnet2_scannet_tpu.models.layers import (
    FC,
    BNMomentumScheduler,
    PointwiseMLP,
    RandomDropout,
)
from pointnet2_scannet_tpu.models.modules import (
    FeaturePropagation,
    LearnableFeaturePropagationMSG,
    SetAbstraction,
    SetAbstractionMSGVotes,
    SetAbstractionVotes,
)
from pointnet2_scannet_tpu.models.pointnet2_cls import (
    PointNet2Cls,
    PointNet2ClsSpec,
    cls_msg_spec,
    cls_ssg_spec,
    get_cls_model,
)
from pointnet2_scannet_tpu.models.pointnet2_partseg import (
    PointNet2PartSeg,
    PointNet2PartSegSpec,
    get_partseg_model,
    partseg_msg_spec,
    partseg_ssg_spec,
)
from pointnet2_scannet_tpu.models.pointnet2 import (
    PointNet2Spec,
    PointNet2SemSeg,
    ssg_spec,
    msg_spec,
    get_model,
)

__all__ = [
    "FC",
    "BNMomentumScheduler",
    "PointwiseMLP",
    "RandomDropout",
    "SetAbstraction",
    "SetAbstractionVotes",
    "SetAbstractionMSGVotes",
    "LearnableFeaturePropagationMSG",
    "FeaturePropagation",
    "PointNet2Cls",
    "PointNet2ClsSpec",
    "cls_ssg_spec",
    "cls_msg_spec",
    "get_cls_model",
    "PointNet2PartSeg",
    "PointNet2PartSegSpec",
    "partseg_ssg_spec",
    "partseg_msg_spec",
    "get_partseg_model",
    "PointNet2Spec",
    "PointNet2SemSeg",
    "ssg_spec",
    "msg_spec",
    "get_model",
]
