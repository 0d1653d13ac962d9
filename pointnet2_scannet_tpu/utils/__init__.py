"""Utilities: voxelization, PLY I/O, normals, timing."""

from pointnet2_scannet_tpu.utils.voxel import surface_voxel_labels
from pointnet2_scannet_tpu.utils.eta import decode_eta, get_eta

__all__ = ["surface_voxel_labels", "decode_eta", "get_eta"]
