"""Point-cloud primitive ops.

TPU-native equivalents of the reference CUDA kernel set
(/root/reference/pointnet2/_ext_src/src/*.cu, bound in bindings.cpp:6-19):

    furthest_point_sample   sampling_gpu.cu:69-229
    gather_points           sampling_gpu.cu:8-57
    ball_query              ball_query_gpu.cu:9-54
    group_points            group_points_gpu.cu:8-75
    three_nn                interpolate_gpu.cu:9-68
    three_interpolate       interpolate_gpu.cu:72-154

All ops are pure JAX functions over fixed-shape padded tensors (jit/vmap/grad
compatible). Gathers use XLA's native gather with scatter-add transposes, so
gradients are deterministic (the reference uses non-deterministic atomicAdd).
Hot ops have Pallas TPU kernel variants in ops/pallas/, auto-selected on TPU
backends when shapes are lane-aligned; pin them globally via
`ops.tuning.ops_config` (e.g. `ops_config.ball_query_pallas = False`) or
per call with each op's `use_pallas`/`use_mxu` keyword.
"""

from pointnet2_scannet_tpu.ops.common import pairwise_sqdist
from pointnet2_scannet_tpu.ops.sampling import furthest_point_sample, gather_points
from pointnet2_scannet_tpu.ops.neighborhood import (
    ball_query,
    group_points,
    query_and_group,
    group_all,
)
from pointnet2_scannet_tpu.ops.interpolate import three_nn, three_interpolate

__all__ = [
    "pairwise_sqdist",
    "furthest_point_sample",
    "gather_points",
    "ball_query",
    "group_points",
    "query_and_group",
    "group_all",
    "three_nn",
    "three_interpolate",
]
