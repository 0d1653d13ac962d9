"""Device-mesh parallelism.

The reference is strictly single-GPU (SURVEY.md §2.4: no DDP/NCCL/MPI
anywhere); here data parallelism over the ICI mesh is a first-class
component: batches are sharded over the 'dp' mesh axis, parameters are
replicated, and XLA's partitioner inserts the gradient psum — no hand-written
collectives on the hot path.
"""

from pointnet2_scannet_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from pointnet2_scannet_tpu.parallel.step import make_parallel_train_step, make_parallel_eval_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "make_parallel_train_step",
    "make_parallel_eval_step",
]
