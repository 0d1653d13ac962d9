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

# engine.train_state is imported lazily inside each builder: importing it
# here closes an import cycle (parallel -> step -> engine -> solver ->
# parallel.step) that breaks any entry point importing `parallel` first
from pointnet2_scannet_tpu.parallel.mesh import batch_sharding, replicated


def make_parallel_train_step(mesh: Mesh, *, num_classes: int, donate: bool = True):
    """Build a jitted data-parallel train step over `mesh`.

    Returns fn(state, batch, rng) -> (state, stats); `batch` arrays must have
    a leading batch axis divisible by the mesh's dp size.
    """
    from pointnet2_scannet_tpu.engine import train_state as ts

    step = functools.partial(ts.train_step, num_classes=num_classes)
    if mesh.size == 1:
        # single device: skip sharding annotations entirely — on the tunneled
        # single-chip backend, sharding-annotated programs pay a per-step
        # host round trip of the whole train state
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    # `shard` is a pytree-prefix: every batch leaf (points/labels/weights/
    # row_mask) is split on its leading axis over 'dp'
    return jax.jit(
        step,
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_fused_train_step(
    mesh: Mesh,
    *,
    num_classes: int,
    axis_name: str | None = None,
    donate: bool = True,
):
    """lax.scan of K sequential train steps dispatched as ONE program.

    Semantics are EXACTLY K calls of the per-batch step — train_step folds
    the dropout key with state.step, which increments inside the scan, so the
    per-step keys, LR schedule positions, and BN updates all match the
    sequential path. What changes is dispatch: the host submits one program
    per K steps, removing per-dispatch latency from the critical path
    (measured ~2-3 ms/step through this tunnel, DESIGN.md §Round-2) and
    letting the device run back-to-back without waiting on the host.

    Returns fn(state, batches, rng) -> (state, stats) where every `batches`
    leaf has a leading (K, ...) scan axis (stack K loader batches) and the
    stats leaves come back stacked (K, ...). Feed multi-device meshes batches
    placed with mesh.fused_batch_sharding (axis 1 = the batch axis).

    axis_name: build the per-device (shard_map) variant — the production
    choice on dp-only meshes where the model carries bn_axis_name (same
    rationale as make_shardmap_train_step); the scan lives INSIDE the
    shard_map region so the fused window is still one program per device.
    """
    from jax import lax

    from pointnet2_scannet_tpu.engine import train_state as ts

    step = functools.partial(
        ts.train_step, num_classes=num_classes, axis_name=axis_name
    )

    def multi(state, batches, rng):
        def body(st, batch):
            return step(st, batch, rng)

        return lax.scan(body, state, batches)

    donate_args = (0,) if donate else ()
    if mesh.size == 1:
        return jax.jit(multi, donate_argnums=donate_args)
    from jax.sharding import NamedSharding, PartitionSpec as P

    if axis_name is not None:
        assert mesh.axis_names == (axis_name,), (
            f"fused shard_map step wants a 1-axis ({axis_name},) mesh, got "
            f"{mesh.axis_names}"
        )
        mapped = jax.shard_map(
            multi,
            mesh=mesh,
            in_specs=(P(), P(None, axis_name), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=donate_args)
    if len(mesh.axis_names) > 1:
        # dp x tp: sharding-agnostic — the state carries its tensor-parallel
        # layout (shard_train_state) and the stacked batches their
        # fused_batch_sharding; explicit replicated in_shardings would
        # silently all-gather the tp-sharded kernels back onto every device
        return jax.jit(multi, donate_argnums=donate_args)
    rep = replicated(mesh)
    shard = NamedSharding(mesh, P(None, mesh.axis_names[0]))
    return jax.jit(
        multi,
        in_shardings=(rep, shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=donate_args,
    )


def make_sharded_train_step(*, num_classes: int, donate: bool = True):
    """Sharding-agnostic train step: no explicit in_shardings — the layout
    follows the data (use parallel.mesh.shard_train_state for tp/dp placement
    of the state and batch_sharding for the batch). GSPMD propagates the
    shardings through the whole step and inserts the collectives. This is the
    Solver's dp x tp production step ("gspmd_dp_tp" strategy): donation keeps
    the updated state on the same tp layout across steps."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    step = functools.partial(ts.train_step, num_classes=num_classes)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sharded_eval_step(*, num_classes: int):
    """Sharding-agnostic eval step for dp x tp meshes: state keeps its
    tensor-parallel layout (shard_train_state), the batch keeps its dp
    sharding, GSPMD inserts the collectives; preds come back batch-sharded
    (they follow the dp batch layout)."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    return jax.jit(functools.partial(ts.eval_step, num_classes=num_classes))


def make_parallel_accum_step(mesh: Mesh, *, num_classes: int):
    """Gradient-accumulation micro-step for whole-scene training: batch rows
    sharded over dp, accumulated outputs replicated."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    step = functools.partial(ts.grad_accum_step, num_classes=num_classes)
    if mesh.size == 1:
        return jax.jit(step)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, shard, rep, rep),
        out_shardings=(rep, rep, rep, rep, rep),
    )


def make_parallel_apply_accum(mesh: Mesh):
    from pointnet2_scannet_tpu.engine import train_state as ts

    if mesh.size == 1:
        return jax.jit(ts.apply_accumulated, donate_argnums=(0,))
    rep = replicated(mesh)
    return jax.jit(
        ts.apply_accumulated,
        in_shardings=(rep, rep, rep),
        out_shardings=rep,
        donate_argnums=(0,),
    )


def make_parallel_eval_step(mesh: Mesh, *, num_classes: int):
    """Build a jitted data-parallel eval step; preds come back batch-sharded."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    step = functools.partial(ts.eval_step, num_classes=num_classes)
    if mesh.size == 1:
        return jax.jit(step)
    rep = replicated(mesh)
    shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, shard),
        out_shardings={"loss": rep, "confusion": rep, "preds": shard},
    )


def make_shardmap_train_step(
    mesh: Mesh, *, num_classes: int, axis_name: str = "dp", donate: bool = True
):
    """Data-parallel train step as an explicit shard_map over `axis_name`.

    Why this exists alongside make_parallel_train_step: GSPMD treats
    pallas_call as an opaque custom call it cannot partition, so under the
    pjit step a multi-chip mesh would all-gather the batch around every
    geometry kernel (FPS / ball query / vmem gather) and run them replicated.
    shard_map instead traces the WHOLE step per device on its batch shard —
    each chip runs its own Pallas kernels on B/dp elements — with the
    cross-device math made explicit: the loss/metrics psum to global-batch
    values (engine/loss.weighted_cross_entropy_sharded), gradients are
    globally correct by differentiation through those psums, and BN
    statistics sync through flax's BatchNorm(axis_name=...) — so the model
    MUST be built with bn_axis_name=axis_name. Numerics match the pjit step
    (tests/test_parallel.py asserts agreement on the virtual mesh).

    Requires a 1-axis (dp-only) mesh; combine with tp via the GSPMD step
    instead.
    """
    from pointnet2_scannet_tpu.engine import train_state as ts

    from jax.sharding import PartitionSpec as P

    if mesh.size == 1:
        step = functools.partial(ts.train_step, num_classes=num_classes)
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    assert mesh.axis_names == (axis_name,), (
        f"shard_map step wants a 1-axis ({axis_name},) mesh, got "
        f"{mesh.axis_names}; use make_parallel_train_step for dp x tp"
    )
    step = functools.partial(
        ts.train_step, num_classes=num_classes, axis_name=axis_name
    )
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P()),  # state/rng replicated, batch split
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by construction (psums)
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_shardmap_eval_step(mesh: Mesh, *, num_classes: int, axis_name: str = "dp"):
    """Forward-only eval step as an explicit shard_map (same rationale as
    make_shardmap_train_step: each chip runs its own Pallas geometry kernels
    on its batch shard instead of GSPMD all-gathering around them).
    loss/confusion psum to global values; preds come back batch-sharded."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    from jax.sharding import PartitionSpec as P

    if mesh.size == 1:
        return jax.jit(functools.partial(ts.eval_step, num_classes=num_classes))
    assert mesh.axis_names == (axis_name,), (
        f"shard_map eval step wants a 1-axis ({axis_name},) mesh, got "
        f"{mesh.axis_names}"
    )
    step = functools.partial(ts.eval_step, num_classes=num_classes, axis_name=axis_name)
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs={"loss": P(), "confusion": P(), "preds": P(axis_name)},
        check_vma=False,
    )
    return jax.jit(mapped)


def make_resident_train_step(
    mesh: Mesh,
    *,
    num_classes: int,
    axis_name: str | None = None,
    donate: bool = True,
):
    """Train step over a device-resident scene store (Solver device_store).

    fn(state, store, batch, rng) -> (state, stats): `store` is the flat
    scene array dict (data.resident.flatten_store, replicated — every device
    gathers its own batch shard's rows locally) and `batch` carries row
    indices + augmentation params instead of materialized features
    (data.resident.materialize_batch runs inside the jitted step, so the
    gather/transform/weight-lookup fuse with the first SA consumers and the
    host ships ~1 MB/step instead of ~9.4 MB at the flagship config).

    axis_name set = the shard_map dp variant (same rationale as
    make_shardmap_train_step; the model must carry bn_axis_name=axis_name).
    The store is NEVER donated — it is reused every step of the run.
    """
    from jax.sharding import PartitionSpec as P

    from pointnet2_scannet_tpu.data.resident import materialize_batch
    from pointnet2_scannet_tpu.engine import train_state as ts

    def step(state, store, batch, rng):
        return ts.train_step(
            state,
            materialize_batch(store, batch),
            rng,
            num_classes=num_classes,
            axis_name=axis_name,
        )

    donate_args = (0,) if donate else ()
    if mesh.size == 1:
        return jax.jit(step, donate_argnums=donate_args)
    assert axis_name is not None and mesh.axis_names == (axis_name,), (
        f"resident step wants a 1-axis ({axis_name},) mesh, got "
        f"{mesh.axis_names} (the Solver gates device_store to single-device "
        "and shard_map_dp runs)"
    )
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),  # store replicated, batch split
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=donate_args)


def make_resident_fused_train_step(
    mesh: Mesh,
    *,
    num_classes: int,
    axis_name: str | None = None,
    donate: bool = True,
):
    """K resident-store train steps per lax.scan program: the fused-dispatch
    form of make_resident_train_step (same semantics as
    make_fused_train_step — batches leaves carry a leading (K, ...) axis,
    stats come back stacked). The store rides as a scan-invariant reference;
    each iteration gathers its own (B, npoints) rows from it on device, so
    one dispatch ships K x ~1 MB of indices instead of K x ~9.4 MB of
    features."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from pointnet2_scannet_tpu.data.resident import materialize_batch
    from pointnet2_scannet_tpu.engine import train_state as ts

    def multi(state, store, batches, rng):
        def body(st, batch):
            return ts.train_step(
                st,
                materialize_batch(store, batch),
                rng,
                num_classes=num_classes,
                axis_name=axis_name,
            )

        return lax.scan(body, state, batches)

    donate_args = (0,) if donate else ()
    if mesh.size == 1:
        return jax.jit(multi, donate_argnums=donate_args)
    assert axis_name is not None and mesh.axis_names == (axis_name,), (
        f"fused resident step wants a 1-axis ({axis_name},) mesh, got "
        f"{mesh.axis_names}"
    )
    mapped = jax.shard_map(
        multi,
        mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=donate_args)


def _sharded_store_specs(axis_name: str):
    """shard_map in_specs for a row-sharded resident store: scene rows split
    over dp, the small class-weight table replicated."""
    from jax.sharding import PartitionSpec as P

    return {"points": P(axis_name), "labels": P(axis_name), "wtable": P()}


def make_resident_sharded_train_step(
    mesh: Mesh,
    *,
    num_classes: int,
    axis_name: str,
    donate: bool = True,
):
    """Resident-store train step with the store ROW-SHARDED over dp.

    Same contract as make_resident_train_step, but each device holds only
    T/dp store rows (capacity scales with the mesh) and
    materialize_batch_sharded resolves global descriptor ids to
    (owner, local-row) with an all_gather + psum_scatter exchange
    (data/resident.py). Multi-device only — a 1-device mesh has nothing to
    shard; the store leaves must be placed with P(axis_name) on rows
    (pad_store_rows makes them divisible)."""
    from jax.sharding import PartitionSpec as P

    from pointnet2_scannet_tpu.data.resident import materialize_batch_sharded
    from pointnet2_scannet_tpu.engine import train_state as ts

    assert mesh.size > 1 and mesh.axis_names == (axis_name,), (
        f"sharded resident step wants a multi-device 1-axis ({axis_name},) "
        f"mesh, got {mesh.axis_names} size {mesh.size}"
    )

    def step(state, store, batch, rng):
        return ts.train_step(
            state,
            materialize_batch_sharded(store, batch, axis_name),
            rng,
            num_classes=num_classes,
            axis_name=axis_name,
        )

    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), _sharded_store_specs(axis_name), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_resident_sharded_fused_train_step(
    mesh: Mesh,
    *,
    num_classes: int,
    axis_name: str,
    donate: bool = True,
):
    """K sharded-resident-store steps per lax.scan program (the fused form
    of make_resident_sharded_train_step; batches leaves carry a leading
    (K, ...) axis). The row-sharded store rides scan-invariant; each scan
    iteration runs its own all_gather/psum_scatter exchange."""
    from jax import lax
    from jax.sharding import PartitionSpec as P

    from pointnet2_scannet_tpu.data.resident import materialize_batch_sharded
    from pointnet2_scannet_tpu.engine import train_state as ts

    assert mesh.size > 1 and mesh.axis_names == (axis_name,), (
        f"fused sharded resident step wants a multi-device 1-axis "
        f"({axis_name},) mesh, got {mesh.axis_names} size {mesh.size}"
    )

    def multi(state, store, batches, rng):
        def body(st, batch):
            return ts.train_step(
                st,
                materialize_batch_sharded(store, batch, axis_name),
                rng,
                num_classes=num_classes,
                axis_name=axis_name,
            )

        return lax.scan(body, state, batches)

    mapped = jax.shard_map(
        multi,
        mesh=mesh,
        in_specs=(
            P(),
            _sharded_store_specs(axis_name),
            P(None, axis_name),
            P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_shardmap_accum_step(mesh: Mesh, *, num_classes: int, axis_name: str = "dp"):
    """Gradient-accumulation micro-step (whole-scene training) as an explicit
    shard_map: per-shard sum-gradients/loss/count/cm psum'd to global values;
    batch_stats sync through the model's bn_axis_name pmean."""
    from pointnet2_scannet_tpu.engine import train_state as ts

    from jax.sharding import PartitionSpec as P

    if mesh.size == 1:
        return jax.jit(functools.partial(ts.grad_accum_step, num_classes=num_classes))
    assert mesh.axis_names == (axis_name,), (
        f"shard_map accum step wants a 1-axis ({axis_name},) mesh, got "
        f"{mesh.axis_names}"
    )
    step = functools.partial(
        ts.grad_accum_step, num_classes=num_classes, axis_name=axis_name
    )
    mapped = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
