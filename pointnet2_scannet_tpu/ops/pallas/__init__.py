"""Pallas TPU kernels for the hot point-cloud primitives.

Each module here provides a drop-in variant of an op in
pointnet2_scannet_tpu.ops, selected automatically on TPU backends.
"""
