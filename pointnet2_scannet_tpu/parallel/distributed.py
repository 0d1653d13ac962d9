"""Multi-host (pod-scale) training support.

The reference is strictly single-process / single-GPU — no DDP, NCCL, or MPI
anywhere (SURVEY.md §2.4). Here the same SPMD step programs that scale over
one host's chips extend to a multi-host TPU pod with three small additions,
all host-side:

  1. `initialize_distributed` joins the processes (`jax.distributed`), after
     which `jax.devices()` is the GLOBAL device list and the Solver's dp mesh
     spans every chip of every host. The jitted step itself is UNCHANGED —
     inside-host collectives ride ICI, cross-host ones ride DCN, both placed
     by XLA.
  2. Each process feeds only ITS rows of the global batch:
     `ProcessContext.place` assembles a global array from process-local data
     (`jax.make_array_from_process_local_data`), with process p's rows at
     global slice [p*B_local, (p+1)*B_local). The data layer gives each
     process a disjoint scene shard (`SceneStore.shard`), so no host ever
     loads or transfers another host's batch rows.
  3. Host-side bookkeeping: replicated outputs (loss, confusion) are readable
     everywhere; dp-sharded outputs (eval preds) are read back per-process
     (`local_rows`); host-computed scalars (voxel metrics) are summed across
     processes (`sum_across_processes`); checkpoint/log writes gate on
     `is_coordinator`.

On this single-host environment the path is exercised with REAL separate
processes over the CPU collectives backend (tests/test_multihost.py drives
2 processes x 4 virtual devices through the full train CLI); on a real pod
the TPU backend takes over transparently — same code, same mesh axis.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# meshes already checked by ProcessContext.validate_mesh (id-keyed: Mesh is
# effectively immutable once built, and the check is O(devices))
_VALIDATED_MESHES: set[int] = set()


def strided_shard(
    items: Sequence, process_id: int, num_processes: int, *, equalize: bool = True
) -> list:
    """THE sharding contract, in one place (ProcessContext.shard_list and
    SceneStore.shard/from_npy_dir_sharded all delegate here): process p gets
    items[p::num_processes]; `equalize` truncates to n // num_processes each
    (TRAINING needs equal per-process step counts or the per-step
    collectives deadlock; distributed eval/visualize pass False to cover
    every item)."""
    if num_processes <= 1:
        return list(items)
    out = list(items)[process_id::num_processes]
    if equalize:
        out = out[: len(items) // num_processes]
    return out


@dataclasses.dataclass(frozen=True)
class ProcessContext:
    """Identity of this process within a multi-process run (1 process = the
    ordinary single-host case; every helper degrades to a no-op/local op)."""

    process_id: int = 0
    num_processes: int = 1

    @classmethod
    def single(cls) -> "ProcessContext":
        return cls(0, 1)

    @property
    def is_coordinator(self) -> bool:
        return self.process_id == 0

    # ------------------------------------------------------------- data layer

    def shard_list(self, items: Sequence, *, equalize: bool = True) -> list:
        """This process's strided shard (see strided_shard). With equalize,
        up to num_processes-1 trailing items are dropped; callers should
        warn on the coordinator when len % num_processes != 0."""
        return strided_shard(
            items, self.process_id, self.num_processes, equalize=equalize
        )

    # ------------------------------------------------------ batch placement

    def validate_mesh(self, mesh: Mesh) -> None:
        """Construction-time checks for the multi-process placement
        contract. `place`'s row layout (process p's rows at global slice
        [p*local, (p+1)*local)) holds only if the mesh's flattened device
        order is process-contiguous IN PROCESS ORDER with equal counts —
        true for jax.devices() on the CPU backend and standard pod
        topologies, but asserted here because a violation would not crash:
        it would silently pair gathered rows with the wrong host data
        (whole-scene val metrics, partseg instance mIoU). Also requires the
        mesh to span every process (a truncated mesh leaves some processes
        outside the collectives and hangs)."""
        if self.num_processes == 1:
            return
        if id(mesh) in _VALIDATED_MESHES:
            return
        devices = list(mesh.devices.ravel())
        if len(devices) != jax.device_count():
            raise ValueError(
                f"multi-process mesh must span every global device "
                f"({jax.device_count()}), got {len(devices)} — leave the "
                "device count unset and pick a batch size divisible by the "
                "global device count"
            )
        pids = [d.process_index for d in devices]
        per = len(devices) // self.num_processes
        expect = [p for p in range(self.num_processes) for _ in range(per)]
        if pids != expect:
            raise ValueError(
                "multi-process mesh devices are not process-contiguous in "
                f"process order (got process ids {pids}); build the mesh "
                "from jax.devices() sorted by process_index or the "
                "local-row placement contract breaks silently"
            )
        _VALIDATED_MESHES.add(id(mesh))

    def place(self, batch, mesh: Mesh, *, axis: int = 0):
        """Place a pytree of process-LOCAL arrays as global arrays sharded on
        `axis` over the mesh's dp axis (replicated on every other axis).

        Multi-process: each leaf's global shape scales axis by num_processes
        and this process's rows land at [pid*local, (pid+1)*local) — matching
        a single-process run whose batch is the process-order concatenation.
        Single-process: a plain sharded device_put.
        """
        assert len(mesh.axis_names) == 1, (
            f"distributed placement wants a 1-axis dp mesh, got {mesh.axis_names}"
        )
        self.validate_mesh(mesh)
        spec = P(*([None] * axis), mesh.axis_names[0])
        sharding = NamedSharding(mesh, spec)
        if self.num_processes == 1:
            return jax.device_put(batch, sharding)

        def leaf(x):
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[axis] *= self.num_processes
            return jax.make_array_from_process_local_data(
                sharding, x, tuple(gshape)
            )

        return jax.tree_util.tree_map(leaf, batch)

    def place_from_global(self, batch, mesh: Mesh, *, axis: int = 0):
        """Like `place`, but every process holds the SAME full global batch
        (whole-scene training iterates scenes globally); each slices out its
        own rows before placement."""
        if self.num_processes == 1:
            return self.place(batch, mesh, axis=axis)

        def myslice(x):
            n = x.shape[axis]
            if n % self.num_processes:
                raise ValueError(
                    f"global batch axis {axis} ({n}) not divisible by "
                    f"{self.num_processes} processes"
                )
            local = n // self.num_processes
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(self.process_id * local, (self.process_id + 1) * local)
            return x[tuple(idx)]

        return self.place(
            jax.tree_util.tree_map(myslice, batch), mesh, axis=axis
        )

    def replicate(self, tree, mesh: Mesh):
        """Replicate a pytree (train state, rng key) onto the global mesh.
        Every process must hold the same values (deterministic same-seed
        init); jax verifies nothing — drift here would silently diverge.

        Multi-process leaves round-trip through host numpy: device_put only
        accepts HOST data for shardings that span non-addressable devices
        (a device-committed array raises), and typed PRNG keys must travel
        as their uint32 key data."""
        sharding = NamedSharding(mesh, P())
        if self.num_processes == 1:
            return jax.device_put(tree, sharding)

        def leaf(x):
            if hasattr(x, "dtype") and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key
            ):
                data = jax.device_put(
                    np.asarray(jax.random.key_data(x)), sharding
                )
                return jax.random.wrap_key_data(data, impl=jax.random.key_impl(x))
            return jax.device_put(np.asarray(x), sharding)

        return jax.tree_util.tree_map(leaf, tree)

    # --------------------------------------------------------- output readback

    def local_rows(self, garr, *, axis: int = 0) -> np.ndarray:
        """This process's rows of a dp-sharded global array, in global row
        order (the inverse of `place`: rows [pid*local, (pid+1)*local))."""
        if self.num_processes == 1:
            return np.asarray(garr)
        shards = sorted(
            garr.addressable_shards, key=lambda s: s.index[axis].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards], axis=axis)

    def all_rows(self, garr) -> np.ndarray:
        """The FULL value of a dp-sharded global array on every process (one
        all-gather). Use sparingly — validation-cadence only."""
        if self.num_processes == 1:
            return np.asarray(garr)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(garr, tiled=True))

    # ------------------------------------------------------- host aggregation

    def sum_across_processes(self, values: np.ndarray) -> np.ndarray:
        """Element-wise sum of a small host vector over all processes (for
        host-computed metric accumulators at validation cadence). Runs under
        enable_x64 so float64 accumulators (e.g. label-histogram counts,
        which exceed 2^24 on real ScanNet splits) survive the collective
        without 32-bit demotion."""
        values = np.asarray(values)
        if self.num_processes == 1:
            return values
        from jax.experimental import multihost_utils

        with jax.enable_x64():
            return np.asarray(
                multihost_utils.process_allgather(values)
            ).sum(axis=0)

    def allgather_ragged(self, rows: np.ndarray) -> np.ndarray:
        """Concatenate per-process (n_p, D) row blocks over all processes in
        process order — n_p may differ (pad-to-max under the hood; the
        collective itself needs uniform shapes). Used to merge per-scene
        eval results from independently-sized scene shards."""
        rows = np.asarray(rows)
        if self.num_processes == 1:
            return rows
        from jax.experimental import multihost_utils

        # enable_x64: without it jax demotes float64/int64 host values to
        # 32-bit in the collective, silently rounding the gathered metrics
        with jax.enable_x64():
            counts = np.asarray(
                multihost_utils.process_allgather(
                    np.array([rows.shape[0]], np.int64)
                )
            ).ravel()
            m = int(counts.max())
            padded = np.zeros((m,) + rows.shape[1:], rows.dtype)
            padded[: rows.shape[0]] = rows
            gathered = np.asarray(multihost_utils.process_allgather(padded))
        return np.concatenate(
            [gathered[p, : int(counts[p])] for p in range(self.num_processes)]
        )

    def assert_uniform(self, value: int, name: str) -> None:
        """Fail fast if a per-process count that gates collectives (e.g.
        steps per epoch) differs across processes — a mismatch would deadlock
        mid-epoch, which is much harder to debug."""
        if self.num_processes == 1:
            return
        from jax.experimental import multihost_utils

        got = np.asarray(
            multihost_utils.process_allgather(np.array([float(value)], np.float64))
        ).ravel()
        if not np.all(got == float(value)):
            raise ValueError(
                f"{name} differs across processes: local={value}, "
                f"all={got.tolist()}"
            )

    def barrier(self, name: str) -> None:
        if self.num_processes == 1:
            return
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def initialize_distributed(
    coordinator_address: str | None,
    num_processes: int = 1,
    process_id: int = 0,
    *,
    auto: bool = False,
) -> ProcessContext:
    """Join a multi-process run. Call BEFORE any other jax API touches
    devices (jax.distributed.initialize's own requirement); afterwards
    jax.devices() lists every process's devices. num_processes <= 1 is the
    ordinary single-process case and initializes nothing.

    auto: let jax discover coordinator/count/id from the runtime (TPU pod
    metadata, SLURM, etc. — jax.distributed.initialize with no arguments);
    the explicit flags are for environments without such metadata (and for
    the CPU-backend process tests)."""
    if auto:
        jax.distributed.initialize()
        return ProcessContext(jax.process_index(), jax.process_count())
    if num_processes <= 1:
        return ProcessContext.single()
    if not coordinator_address:
        raise ValueError(
            "distributed runs need --dist_coordinator host:port (the same "
            "address on every process; process 0 binds it)"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return ProcessContext(process_id, num_processes)
