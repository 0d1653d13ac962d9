"""Device-mesh parallelism.

The reference is strictly single-GPU (SURVEY.md §2.4: no DDP/NCCL/MPI
anywhere); here data parallelism over the ICI mesh is a first-class
component: batches are sharded over the 'dp' mesh axis, parameters are
replicated, and XLA's partitioner inserts the gradient psum — no hand-written
collectives on the hot path.
"""

from pointnet2_scannet_tpu.parallel.distributed import (
    ProcessContext,
    initialize_distributed,
)
from pointnet2_scannet_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    fused_batch_sharding,
    replicated,
    shard_train_state,
    train_state_shardings,
)
from pointnet2_scannet_tpu.parallel.step import (
    make_parallel_train_step,
    make_parallel_eval_step,
    make_parallel_accum_step,
    make_parallel_apply_accum,
    make_sharded_train_step,
    make_sharded_eval_step,
    make_fused_train_step,
    make_resident_train_step,
    make_resident_fused_train_step,
    make_resident_sharded_train_step,
    make_resident_sharded_fused_train_step,
)

__all__ = [
    "ProcessContext",
    "initialize_distributed",
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "fused_batch_sharding",
    "replicated",
    "shard_train_state",
    "train_state_shardings",
    "make_parallel_train_step",
    "make_parallel_eval_step",
    "make_parallel_accum_step",
    "make_parallel_apply_accum",
    "make_sharded_train_step",
    "make_sharded_eval_step",
    "make_fused_train_step",
    "make_resident_train_step",
    "make_resident_fused_train_step",
    "make_resident_sharded_train_step",
    "make_resident_sharded_fused_train_step",
]
