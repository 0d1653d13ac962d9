"""Mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int | None = None,
    *,
    axis_name: str = "dp",
    batch_size: int | None = None,
) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices.

    When `num_devices` is None, uses every device — unless `batch_size` is
    given, in which case it uses the largest device count that divides the
    batch (a dp shard needs a whole number of batch rows).
    """
    devices = jax.devices()
    if num_devices is None:
        num_devices = len(devices)
        if batch_size is not None:
            while num_devices > 1 and batch_size % num_devices != 0:
                num_devices -= 1
    if num_devices > len(devices):
        raise ValueError(f"requested {num_devices} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:num_devices]), (axis_name,))


def dp_mesh_or_none(
    num_devices: int | None, *, batch_size: int | None = None
) -> Mesh | None:
    """dp mesh for num_devices > 1; None/0/1 means plain single-device.

    Shared by the eval/visualize CLIs' --num_devices flag so the two can't
    drift.
    """
    if num_devices in (None, 0, 1):
        return None
    return make_mesh(num_devices, batch_size=batch_size)


def local_dp_mesh_or_none(
    num_devices: int | None, *, batch_size: int
) -> Mesh | None:
    """Per-process LOCAL device mesh for distributed eval/visualize: those
    forwards have no collectives, so each process meshes over its own chips
    only (a global mesh would force cross-host collectives into them).
    Shared by both CLIs' --num_devices handling so the shrink rule can't
    drift. None/0/1 means plain single-device."""
    if num_devices in (None, 0, 1):
        return None
    k = num_devices
    while k > 1 and batch_size % k != 0:
        k -= 1
    local = jax.local_devices()
    if k > len(local):
        raise ValueError(
            f"--num_devices {num_devices} exceeds this process's "
            f"{len(local)} local devices in a distributed run"
        )
    return Mesh(np.asarray(local[:k]), ("dp",))


def make_mesh_2d(
    dp: int, tp: int, *, axis_names: tuple[str, str] = ("dp", "tp")
) -> Mesh:
    """2-D mesh: data parallelism x tensor parallelism."""
    devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"requested {dp}x{tp} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[: dp * tp]).reshape(dp, tp), axis_names)


def batch_sharding(mesh: Mesh, *, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the dp mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def fused_batch_sharding(mesh: Mesh, *, axis_name: str = "dp") -> NamedSharding:
    """Shard axis 1 — the batch axis of (fused, B, ...) stacked batches fed
    to make_fused_train_step — over the dp mesh axis; the leading scan axis
    stays unsharded."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def train_state_shardings(state, mesh: Mesh, *, tp_axis: str = "tp"):
    """Tensor-parallel sharding tree for a TrainState, by leaf shape.

    Every 2-D leaf is a pointwise-MLP (Dense) kernel (in, out) -> sharded
    P(None, tp) over the output channels; 1-D leaves (biases, BN scale/bias/
    stats, and the matching Adam moments) -> P(tp). Dimensions not divisible
    by the tp size stay replicated (e.g. the 20-class head). Scalars (step,
    Adam count) stay replicated. Activations are left to GSPMD propagation:
    x[P(dp)] @ W[P(None, tp)] yields channel-sharded activations with the
    partitioner inserting the all-gathers/reduce-scatters over ICI.
    """
    tp = mesh.shape[tp_axis]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) == 2 and shape[1] % tp == 0:
            return NamedSharding(mesh, P(None, tp_axis))
        if len(shape) == 1 and shape[0] % tp == 0 and shape[0] >= tp:
            return NamedSharding(mesh, P(tp_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, state)


def shard_train_state(state, mesh: Mesh, *, tp_axis: str | None = None):
    """device_put a TrainState onto the mesh — replicated, or tensor-parallel
    when the mesh has a tp axis."""
    if tp_axis is not None and tp_axis in mesh.axis_names and mesh.shape[tp_axis] > 1:
        return jax.device_put(state, train_state_shardings(state, mesh, tp_axis=tp_axis))
    return jax.device_put(state, replicated(mesh))
