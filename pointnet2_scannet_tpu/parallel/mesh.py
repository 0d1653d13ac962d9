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


def batch_sharding(mesh: Mesh, *, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (batch) axis over the dp mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
