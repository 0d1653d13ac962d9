"""Sharded train/eval steps.

Replaces the reference's single-GPU forward/backward (lib/solver.py:155-181)
with pjit-style SPMD: the batch is sharded over the 'dp' axis, the train
state is replicated, and the partitioner turns the per-shard gradients into a
psum over ICI (the scalar loss and confusion-matrix outputs get the same
treatment). The same step runs unchanged on 1 device or a full v5e-8 mesh.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh

from pointnet2_scannet_tpu.engine import train_state as ts
from pointnet2_scannet_tpu.parallel.mesh import batch_sharding, replicated


def make_parallel_train_step(mesh: Mesh, *, num_classes: int, donate: bool = True):
    """Build a jitted data-parallel train step over `mesh`.

    Returns fn(state, batch, rng) -> (state, stats); `batch` arrays must have
    a leading batch axis divisible by the mesh's dp size.
    """
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    step = functools.partial(ts.train_step, num_classes=num_classes)
    # `shard` is a pytree-prefix: every batch leaf (points/labels/weights/
    # row_mask) is split on its leading axis over 'dp'
    return jax.jit(
        step,
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_eval_step(mesh: Mesh, *, num_classes: int):
    """Build a jitted data-parallel eval step; preds come back batch-sharded."""
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    step = functools.partial(ts.eval_step, num_classes=num_classes)
    return jax.jit(
        step,
        in_shardings=(rep, shard),
        out_shardings={"loss": rep, "confusion": rep, "preds": shard},
    )
