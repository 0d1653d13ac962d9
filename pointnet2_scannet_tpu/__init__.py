"""pointnet2_scannet_tpu — a TPU-native PointNet++ semantic-segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
CUDA/PyTorch pipeline (ero1311/Pointnet2.ScanNet): point-cloud primitives as
XLA/Pallas kernels over fixed-shape padded tensors, Flax set-abstraction /
feature-propagation models (SSG and MSG), a chunked-scene data pipeline,
a functional jit/sharded training engine, whole-scene sliding-window
evaluation with point/voxel/calibrated-voxel accuracy and mIoU, multiview
feature projection, ScanNet preprocessing, and PLY visualization.

Layout convention: unlike the reference (channels-first (B, C, N)), every
feature tensor in this framework is channels-LAST (B, N, C) / (B, M, K, C) —
the natural layout for TPU (C rides the 128-wide lane dimension and feeds the
MXU directly via einsum).
"""

__version__ = "0.1.0"

from pointnet2_scannet_tpu import ops  # noqa: F401
