"""Training engine.

The TPU-native counterpart of the reference Solver (lib/solver.py:60-477):
per-epoch chunk regeneration, train + val passes, StepLR-style decay,
best-model checkpointing keyed on mean val voxel mIoU, TensorBoard-style
scalar logs with an all_scalars.json export, and iter/epoch/best stdout
reports with ETA.

Deliberate redesigns (SURVEY.md §2.4/§5):
  - The train step is ONE jitted SPMD program (forward+loss+backward+update+
    confusion matrix); batches stream through a double-buffered host->device
    prefetcher, so the device never blocks on the host between steps.
  - Point-level training metrics come from on-device confusion matrices —
    the reference instead syncs device->host and voxelizes with numpy EVERY
    training iteration (lib/solver.py:225,327-347), its biggest throughput
    bug. Voxel-level metrics (which need coordinate dedup + voxel hashing)
    are computed on host at validation cadence, exactly like the reference's
    formulas.
"""

from __future__ import annotations

import pathlib
import time

import jax
import numpy as np

from pointnet2_scannet_tpu.config import RunConfig
from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.pipeline import BatchLoader, prefetch_to_device
from pointnet2_scannet_tpu.engine import metrics as M
from pointnet2_scannet_tpu.engine import train_state as ts
from pointnet2_scannet_tpu.engine.checkpoint import save_checkpoint
from pointnet2_scannet_tpu.engine.logging import ScalarLogger
from pointnet2_scannet_tpu.parallel.distributed import ProcessContext
from pointnet2_scannet_tpu.parallel.mesh import (
    batch_sharding,
    fused_batch_sharding,
    make_mesh,
    replicated,
    shard_train_state,
)
from pointnet2_scannet_tpu.parallel.step import (
    make_fused_train_step,
    make_parallel_eval_step,
    make_parallel_train_step,
    make_resident_fused_train_step,
    make_resident_sharded_fused_train_step,
    make_resident_sharded_train_step,
    make_resident_train_step,
    make_sharded_eval_step,
    make_sharded_train_step,
    make_shardmap_eval_step,
    make_shardmap_train_step,
)
from pointnet2_scannet_tpu.utils.eta import decode_eta

ITER_REPORT = (
    "epoch [{epoch}/{epochs}] iter [{iter}/{iters}] "
    "loss {loss:.5f} point_acc {point_acc:.4f} point_miou {point_miou:.4f} "
    "fetch {fetch:.3f}s step {step:.3f}s eta {eta_h}h {eta_m}m {eta_s}s"
)
EPOCH_REPORT = (
    "epoch [{epoch}/{epochs}] done: train loss {train_loss:.5f} "
    "val loss {val_loss:.5f} val point_miou {val_point_miou:.4f} "
    "val voxel_miou {val_voxel_miou:.4f}"
)
BEST_REPORT = "best voxel_miou {voxel_miou:.4f} at epoch {epoch}"


def _device_store_budget() -> int:
    """HBM budget for the device-resident scene store (device_store mode).
    Default 8 GiB — half a v5e chip's 16 GiB, leaving the other half for
    activations/params/optimizer; PN2_DEVICE_STORE_BUDGET_GB overrides."""
    import os

    return int(float(os.environ.get("PN2_DEVICE_STORE_BUDGET_GB", "8")) * 2**30)


class _NullLogger:
    """Stand-in for ScalarLogger on non-coordinator processes: metrics are
    identical on every process (replicated/psum'd), so one writer suffices."""

    def add_scalars(self, *args, **kwargs) -> None:
        pass

    def export(self) -> None:
        pass


class Solver:
    """Orchestrates training of a PointNet2SemSeg model on chunked scenes."""

    def __init__(
        self,
        model,
        train_dataset: ChunkedSceneDataset,
        val_dataset: ChunkedSceneDataset | None,
        config: RunConfig,
        output_dir: str | pathlib.Path,
        *,
        mesh=None,
        process_ctx: ProcessContext | None = None,
        compute_voxel_metrics: bool = True,
        trace_dir: str | pathlib.Path | None = None,
    ):
        self.model = model
        self.config = config
        # profiler capture (execution-only, never serialized into the run
        # config): one epoch's train loop is wrapped in jax.profiler.trace
        # and written here as a TensorBoard/XProf trace. The reference's only
        # instrumentation is wall-clock prints (lib/solver.py:222-246).
        self.trace_dir = trace_dir
        self.train_dataset = train_dataset
        self.val_dataset = val_dataset
        self.output_dir = pathlib.Path(output_dir)
        self.compute_voxel_metrics = compute_voxel_metrics

        # multi-host: the ctx carries this process's identity; loaders hold
        # LOCAL rows (tc.batch_size stays the GLOBAL batch), placement
        # assembles global arrays, and every filesystem write + stdout report
        # gates on the coordinator (parallel/distributed.py)
        self.ctx = process_ctx or ProcessContext.single()
        if self.ctx.is_coordinator:
            self.output_dir.mkdir(parents=True, exist_ok=True)

        tc = config.train
        self.mesh = (
            mesh
            if mesh is not None
            else make_mesh(tc.num_devices, batch_size=tc.batch_size)
        )
        if self.ctx.num_processes > 1:
            if tc.batch_size % self.ctx.num_processes:
                raise ValueError(
                    f"global batch_size {tc.batch_size} not divisible by "
                    f"{self.ctx.num_processes} processes"
                )
            if len(self.mesh.axis_names) != 1:
                raise ValueError(
                    "multi-process runs need a dp-only mesh (dp x tp would "
                    "shard parameters across hosts that feed disjoint data)"
                )
            # fail at construction on truncated (hang) or non-process-
            # contiguous (silent row-pairing corruption) meshes — e.g. a
            # resumed config's saved num_devices, or make_mesh's batch-
            # divisibility shrink loop, could otherwise slip one through
            self.ctx.validate_mesh(self.mesh)
        self.local_batch_size = tc.batch_size // self.ctx.num_processes
        # single device: plain device_put (NamedSharding placement pays a
        # host round trip on the tunneled single-chip backend)
        self.batch_sharding = (
            batch_sharding(self.mesh, axis_name=self.mesh.axis_names[0])
            if self.mesh.size > 1
            else None
        )

        # device-resident scene store (the train-side descriptor dispatch,
        # data/resident.py): gate the run shapes it supports and fall back
        # to the host collate path with a warning otherwise — identical math
        # either way (tested: tests/test_resident.py)
        self.device_store = bool(getattr(tc, "device_store", False))
        self._store_dev = None
        self._store_sharded = False
        if self.device_store:
            reason = None
            if not hasattr(train_dataset, "get_item_resident"):
                reason = (
                    "the train dataset has no resident mode (chunked "
                    "training only)"
                )
            elif self.ctx.num_processes > 1:
                reason = (
                    "multi-process runs hold per-process scene shards; a "
                    "replicated device store would need every shard on "
                    "every host"
                )
            elif self.mesh.size > 1 and (
                len(self.mesh.axis_names) != 1
                or getattr(model, "bn_axis_name", None) != self.mesh.axis_names[0]
            ):
                reason = (
                    "resident steps are single-device or shard_map_dp only "
                    "(dp-only mesh with bn_axis_name set)"
                )
            else:
                from pointnet2_scannet_tpu.data.resident import store_nbytes

                nbytes = store_nbytes(train_dataset.store, config.data)
                budget = _device_store_budget()
                if nbytes > budget and self.mesh.size > 1:
                    # row-shard the store over dp: each device holds T/dp
                    # rows (capacity x mesh size), descriptor ids resolve to
                    # (owner, local-row) inside the shard_map step
                    # (data/resident.materialize_batch_sharded). Replicated
                    # placement stays the default for stores that fit one
                    # device — no per-step ICI exchange.
                    if nbytes <= budget * self.mesh.size:
                        self._store_sharded = True
                    else:
                        reason = (
                            f"flat store needs {nbytes / 2**30:.2f} GiB > "
                            f"budget {budget / 2**30:.1f} GiB even row-"
                            f"sharded over {self.mesh.size} devices (set "
                            "PN2_DEVICE_STORE_BUDGET_GB to raise)"
                        )
                elif nbytes > budget:
                    reason = (
                        f"flat store needs {nbytes / 2**30:.2f} GiB > budget "
                        f"{budget / 2**30:.1f} GiB (set "
                        "PN2_DEVICE_STORE_BUDGET_GB to raise)"
                    )
            if reason is not None:
                self._say(
                    f"WARNING: device_store disabled: {reason}", flush=True
                )
                self.device_store = False
            else:
                train_dataset.resident = True

        self._make_loaders(train_dataset, val_dataset, tc)
        # a per-step collective count mismatch across processes deadlocks
        # mid-epoch; fail at construction instead
        self.ctx.assert_uniform(len(self.train_loader), "train steps per epoch")
        if self.val_loader is not None:
            self.ctx.assert_uniform(len(self.val_loader), "val steps per epoch")

        steps_per_epoch = max(self._steps_per_epoch(), 1)
        schedule = ts.make_lr_schedule(
            tc.lr, tc.decay_step, tc.decay_factor, steps_per_epoch
        )
        tx = ts.make_optimizer(schedule, tc.weight_decay)

        num_classes = config.model.num_classes
        rng = jax.random.key(tc.seed)
        init_rng, self.dropout_rng = jax.random.split(rng)
        c = 3 + config.data.input_channels
        sample = np.zeros((1, config.data.npoints, c), np.float32)
        self.state = ts.create_train_state(model, init_rng, sample, tx)
        if self.ctx.num_processes > 1:
            # same-seed init is identical on every process; make the
            # replication explicit so jit never sees host-local inputs
            self.state = self.ctx.replicate(self.state, self.mesh)
            self.dropout_rng = self.ctx.replicate(self.dropout_rng, self.mesh)

        # parallel strategy: on a dp-only multi-device mesh the production
        # path is the explicit shard_map step — GSPMD treats pallas_call as an
        # opaque custom call it cannot partition, so the pjit step would
        # all-gather the batch around every geometry kernel and run them
        # replicated on a real multi-chip mesh (parallel/step.py:110-127).
        # Requires the model built with bn_axis_name=<dp axis> so train-time
        # BN normalizes over the global batch; dp x tp meshes keep pjit/GSPMD.
        dp_axis = self.mesh.axis_names[0] if len(self.mesh.axis_names) == 1 else None
        model_bn_axis = getattr(model, "bn_axis_name", None)
        if len(self.mesh.axis_names) > 1:
            # dp x tp: tensor-parallel production path ("gspmd_dp_tp") — the
            # state is laid out tensor-parallel (Dense kernels + Adam moments
            # split over the tp axis, parallel/mesh.shard_train_state), the
            # batch keeps its dp sharding, and the sharding-AGNOSTIC jitted
            # step lets GSPMD propagate both layouts and insert the ICI
            # collectives; explicit replicated in_shardings (the plain pjit
            # step) would silently all-gather the tp-sharded kernels back
            # onto every device each step. BN pmean is incompatible with tp
            # (bn_axis_name must be None; checked below).
            if model_bn_axis is not None:
                raise ValueError(
                    f"model bn_axis_name={model_bn_axis!r} on a dp x tp mesh: "
                    "the shard_map BN pmean path is dp-only — build the model "
                    "with bn_axis_name=None for tensor parallelism"
                )
            tp_axis = self.mesh.axis_names[1]
            self.parallel_strategy = "gspmd_dp_tp"
            self.state = shard_train_state(self.state, self.mesh, tp_axis=tp_axis)
            self.dropout_rng = jax.device_put(self.dropout_rng, replicated(self.mesh))
            self._train_step = make_sharded_train_step(num_classes=num_classes)
            self._eval_step = make_sharded_eval_step(num_classes=num_classes)
        elif self.mesh.size > 1 and dp_axis is not None and model_bn_axis == dp_axis:
            self.parallel_strategy = "shard_map_dp"
            self._train_step = make_shardmap_train_step(
                self.mesh, num_classes=num_classes, axis_name=dp_axis
            )
            self._eval_step = make_shardmap_eval_step(
                self.mesh, num_classes=num_classes, axis_name=dp_axis
            )
        else:
            if self.mesh.size > 1 and dp_axis is not None and model_bn_axis is None:
                print(
                    "WARNING: dp-only multi-device mesh but the model was built "
                    "without bn_axis_name — falling back to the pjit step, which "
                    "replicates the Pallas geometry kernels on real multi-chip "
                    "meshes. Build the model with bn_axis_name="
                    f"'{dp_axis}' to enable the shard_map step.",
                    flush=True,
                )
            elif self.mesh.size > 1 and model_bn_axis is not None and model_bn_axis != dp_axis:
                raise ValueError(
                    f"model bn_axis_name={model_bn_axis!r} does not match the "
                    f"mesh axes {self.mesh.axis_names}; build the model with "
                    "bn_axis_name equal to the dp axis (or None for pjit)"
                )
            elif self.mesh.size == 1 and model_bn_axis is not None:
                raise ValueError(
                    "model built with bn_axis_name but the mesh has one device; "
                    "BatchNorm's pmean needs a mapped axis — build the model "
                    "with bn_axis_name=None for single-device runs"
                )
            self.parallel_strategy = "pjit" if self.mesh.size > 1 else "single"
            self._train_step = make_parallel_train_step(
                self.mesh, num_classes=num_classes
            )
            self._eval_step = make_parallel_eval_step(
                self.mesh, num_classes=num_classes
            )
        self.num_classes = num_classes

        # fused multi-step dispatch (TrainConfig.fused_steps > 1): K steps per
        # lax.scan program — exact per-step math, one dispatch per K steps
        self.fused_steps = max(int(getattr(tc, "fused_steps", 1) or 1), 1)
        self._fused_train_step = None
        self._fused_sharding = None
        fusable = isinstance(self.train_loader, BatchLoader) or self.device_store
        if self.fused_steps > 1 and fusable:
            if not self.device_store:
                self._fused_train_step = make_fused_train_step(
                    self.mesh,
                    num_classes=num_classes,
                    axis_name=(
                        dp_axis if self.parallel_strategy == "shard_map_dp" else None
                    ),
                )
            if self.mesh.size > 1:
                self._fused_sharding = fused_batch_sharding(
                    self.mesh, axis_name=self.mesh.axis_names[0]
                )

        if self.device_store:
            # flatten + upload the store once and swap the train steps for
            # the resident variants — the call sites are unchanged, the
            # wrappers just thread the resident store through as a runtime
            # argument (closing over the 5+ GB array would bake it into the
            # executable as a constant). Placement: replicated when the
            # store fits one device's budget (each device gathers its batch
            # shard's rows locally, no exchange), row-sharded over dp when
            # it only fits the MESH's aggregate budget (capacity x dp; the
            # step runs an all_gather/psum_scatter exchange per batch —
            # data/resident.materialize_batch_sharded).
            from pointnet2_scannet_tpu.data.resident import (
                flatten_store,
                pad_store_rows,
            )

            pts, labels = flatten_store(train_dataset.store, config.data)
            wtable = train_dataset.store.label_weights.astype(np.float32)
            res_axis = dp_axis if self.parallel_strategy == "shard_map_dp" else None
            if self._store_sharded:
                from jax.sharding import NamedSharding, PartitionSpec

                pts, labels = pad_store_rows(pts, labels, self.mesh.size)
                rows = NamedSharding(self.mesh, PartitionSpec(res_axis))
                self._store_dev = {
                    "points": jax.device_put(pts, rows),
                    "labels": jax.device_put(labels, rows),
                    "wtable": jax.device_put(wtable, replicated(self.mesh)),
                }
                self._say(
                    f"device_store: rows sharded over {self.mesh.size} "
                    f"devices ({pts.nbytes / 2**30 / self.mesh.size:.2f} "
                    "GiB/device)",
                    flush=True,
                )
                res_step = make_resident_sharded_train_step(
                    self.mesh, num_classes=num_classes, axis_name=res_axis
                )
            else:
                store = {"points": pts, "labels": labels, "wtable": wtable}
                self._store_dev = (
                    jax.device_put(store, replicated(self.mesh))
                    if self.mesh.size > 1
                    else jax.device_put(store)
                )
                res_step = make_resident_train_step(
                    self.mesh, num_classes=num_classes, axis_name=res_axis
                )
            self._train_step = lambda s, b, r, _f=res_step: _f(
                s, self._store_dev, b, r
            )
            if self.fused_steps > 1:
                if self._store_sharded:
                    res_fused = make_resident_sharded_fused_train_step(
                        self.mesh, num_classes=num_classes, axis_name=res_axis
                    )
                else:
                    res_fused = make_resident_fused_train_step(
                        self.mesh, num_classes=num_classes, axis_name=res_axis
                    )
                self._fused_train_step = lambda s, b, r, _f=res_fused: _f(
                    s, self._store_dev, b, r
                )

        self.logger = (
            ScalarLogger(self.output_dir) if self.ctx.is_coordinator else _NullLogger()
        )
        self.best = {"epoch": -1, "voxel_miou": -1.0}
        self._global_iter = 0
        if self.ctx.is_coordinator:
            config.save(self.output_dir / "config.json")

    # -------------------------------------------------------------- loaders

    def _say(self, *args, **kwargs) -> None:
        """Coordinator-only stdout (multi-process runs would interleave N
        copies of every report otherwise)."""
        if self.ctx.is_coordinator:
            print(*args, **kwargs)

    @staticmethod
    def _fused_group(item) -> int | None:
        """K when `item` is a fused (K, ...)-stacked group, else None.
        Host batches carry (B, NP, C) "points"; resident batches carry
        (B, NP) "idx" — one rank lower, same leading-axis convention."""
        if "points" in item:
            return item["points"].shape[0] if item["points"].ndim == 4 else None
        return item["idx"].shape[0] if item["idx"].ndim == 3 else None

    def _place_item(self, item):
        """Host batch -> device placement: plain put single-device, sharded
        put on a single-process mesh, global assembly from this process's
        local rows in multi-process runs. Fused (K, B, ...) groups shard
        axis 1; per-batch items shard axis 0."""
        fused = self._fused_group(item) is not None
        if self.ctx.num_processes > 1:
            return self.ctx.place(item, self.mesh, axis=1 if fused else 0)
        if self.mesh.size == 1:
            return jax.device_put(item)
        return jax.device_put(
            item, self._fused_sharding if fused else self.batch_sharding
        )

    def _local_preds(self, preds) -> np.ndarray:
        """Eval preds come back batch-sharded; each process reads back only
        the rows it fed (they pair with its host-side coords/labels)."""
        return self.ctx.local_rows(preds)

    def _make_loaders(self, train_dataset, val_dataset, tc):
        # train: drop the ragged trailing batch (padding would pollute the
        # BatchNorm batch statistics with zero rows); val: pad it to the one
        # compiled shape and mask the pad rows out of loss + metrics.
        # Multi-process: the datasets are this process's scene shard and the
        # loaders assemble LOCAL rows (batch_size/num_processes per batch).
        if getattr(self, "device_store", False):
            from pointnet2_scannet_tpu.data.resident import ResidentBatchLoader

            # resident batches (row indices + aug params); full batches only
            # — the same drop_last semantics as the host train loader
            self.train_loader = ResidentBatchLoader(
                train_dataset, self.local_batch_size, seed=tc.seed,
                shuffle=tc.shuffle,
            )
        else:
            self.train_loader = BatchLoader(
                train_dataset, self.local_batch_size, seed=tc.seed,
                drop_last=True, shuffle=tc.shuffle,
            )
        if len(self.train_loader) == 0:
            raise ValueError(
                f"training dataset ({len(train_dataset)} items) yields zero "
                f"batches at batch_size={self.local_batch_size} with drop_last — "
                "reduce batch_size or add scenes"
            )
        self.val_loader = (
            BatchLoader(
                val_dataset, self.local_batch_size, seed=tc.seed, pad_last=True
            )
            if val_dataset is not None
            else None
        )

    def _steps_per_epoch(self) -> int:
        return len(self.train_loader)

    def _regenerate(self) -> None:
        if hasattr(self.train_dataset, "generate_chunks"):
            self.train_dataset.generate_chunks()
        if self.val_dataset is not None and hasattr(self.val_dataset, "generate_chunks"):
            self.val_dataset.generate_chunks()

    # ----------------------------------------------------------------- resume

    def resume(self, name: str = "model_last") -> int:
        """Restore params/batch_stats/optimizer/step + best metadata from a
        prior run in the same output dir; returns the epoch to continue from.
        (The reference cannot resume at all — optimizer/scheduler/epoch state
        are never saved, SURVEY.md §5.)"""
        from pointnet2_scannet_tpu.engine.checkpoint import restore_checkpoint

        self.state, meta = restore_checkpoint(self.output_dir, name, self.state)
        if self.parallel_strategy == "gspmd_dp_tp":
            # restored leaves are host arrays; re-establish the tensor-
            # parallel layout before the sharding-agnostic step sees them
            self.state = shard_train_state(
                self.state, self.mesh, tp_axis=self.mesh.axis_names[1]
            )
        if self.ctx.num_processes > 1:
            # every process restored the same host arrays from the
            # coordinator's run dir (shared filesystem); re-replicate onto
            # the global mesh so the step never sees host-local leaves
            self.state = self.ctx.replicate(self.state, self.mesh)
        if meta.get("best"):
            self.best = meta["best"]
        start_epoch = int(meta.get("epoch", -1)) + 1
        self._global_iter = start_epoch * max(len(self.train_loader), 1)
        return start_epoch

    # ------------------------------------------------------------------ train

    def __call__(
        self,
        epochs: int | None = None,
        verbose: int | None = None,
        start_epoch: int = 0,
    ):
        tc = self.config.train
        epochs = epochs if epochs is not None else tc.epochs
        verbose = verbose if verbose is not None else tc.verbose
        t_start = time.time()
        for epoch in range(start_epoch, epochs):
            self._regenerate()
            # overlap next epoch's host-side chunk resampling with this
            # epoch's device compute
            if epoch + 1 < epochs:
                for ds in (self.train_dataset, self.val_dataset):
                    if ds is not None and hasattr(ds, "start_regen_async"):
                        ds.start_regen_async()

            # profiler capture: trace the SECOND epoch when there is one
            # (epoch 0 carries the jit compiles, which would dwarf the
            # steady-state timeline), once, coordinator only
            if (
                self.trace_dir is not None
                and epoch == min(start_epoch + 1, epochs - 1)
                and self.ctx.is_coordinator
            ):
                from ..utils.profiling import trace

                self._say(f"capturing profiler trace -> {self.trace_dir}", flush=True)
                with trace(str(self.trace_dir)):
                    train_stats = self._run_train_epoch(epoch, epochs, verbose, t_start)
                self.trace_dir = None
            else:
                train_stats = self._run_train_epoch(epoch, epochs, verbose, t_start)
            self.logger.add_scalars("train", train_stats, epoch)

            if self.val_loader is not None:
                val_stats = self._run_val_epoch()
                self.logger.add_scalars("val", val_stats, epoch)
                if val_stats.get("voxel_miou", -1.0) > self.best["voxel_miou"]:
                    self.best = {"epoch": epoch, **val_stats}
                    self._say(BEST_REPORT.format(voxel_miou=val_stats["voxel_miou"], epoch=epoch), flush=True)
                    if self.ctx.is_coordinator:
                        save_checkpoint(
                            self.output_dir,
                            "model_best",
                            self.state,
                            epoch=epoch,
                            best=self.best,
                            config_json=self.config.to_json(),
                        )
                self._say(
                    EPOCH_REPORT.format(
                        epoch=epoch + 1,
                        epochs=epochs,
                        train_loss=train_stats["loss"],
                        val_loss=val_stats["loss"],
                        val_point_miou=val_stats["point_miou"],
                        val_voxel_miou=val_stats.get("voxel_miou", float("nan")),
                    ),
                    flush=True,
                )
            # every-epoch model_last keeps the run resumable after a crash
            # or kill (resume() reads model_last; without this an
            # interrupted 500-epoch run would leave nothing to resume from)
            if self.ctx.is_coordinator:
                save_checkpoint(
                    self.output_dir,
                    "model_last",
                    self.state,
                    epoch=epoch,
                    best=self.best,
                    config_json=self.config.to_json(),
                )
        if epochs <= start_epoch and self.ctx.is_coordinator:
            # zero-epoch call: model_last must still exist
            save_checkpoint(
                self.output_dir, "model_last", self.state,
                epoch=start_epoch - 1, best=self.best,
                config_json=self.config.to_json(),
            )
        if self.ctx.is_coordinator:
            (self.output_dir / "best.txt").write_text(
                "\n".join(f"{k}: {v}" for k, v in self.best.items())
            )
        self.logger.export()
        return self.best

    def _fused_group_stream(self):
        """(K, B, ...)-stacked groups of train batches, then any leftover
        batches per-batch (the epoch tail when len % K != 0)."""
        buf = []
        for b in iter(self.train_loader):
            buf.append(b)
            if len(buf) == self.fused_steps:
                yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *buf)
                buf = []
        yield from buf

    def _run_train_epoch_fused(self, epoch, epochs, verbose, t_start):
        """Train epoch dispatching K steps per fused-scan program.

        Per-step math is identical to _run_train_epoch (tested:
        tests/test_parallel.py fused agreement); stats stay on device until
        the verbose/epoch boundary so groups dispatch back-to-back.
        losses/cms collect per-GROUP stacked leaves ((K,)/(K, C, C)) and are
        flattened at reporting time. Iter-report timing semantics match the
        per-batch path (and the reference's fetch/forward split,
        lib/solver.py:214-230): fetch is the real per-step host wait for the
        prefetcher (group wait / K), and step is ONE settled dispatch —
        drained before, fetched after, divided by K — measured once per
        verbose window, not a cumulative wall-clock mean.
        """
        losses, cms = [], []
        fetch_times, step_times = [], []
        iters = len(self.train_loader)
        it_done, last_report = 0, 0
        last = time.time()
        for item in prefetch_to_device(
            self._fused_group_stream(), place=self._place_item
        ):
            now = time.time()
            k = self._fused_group(item) or 1
            fetch_times.append((now - last) / k)  # per-step host wait
            # will this group's completion cross a verbose boundary? then it
            # is the one report-window dispatch we time for real
            timed = bool(verbose) and (it_done + k) // verbose > last_report // verbose
            if timed:
                # drain the async dispatch queue so the measurement is one
                # true fused program, not the whole async window; fetching a
                # scalar is required — on the axon tunnel backend
                # block_until_ready returns before execution finishes
                np.asarray(self.state.step)
                t_step = time.time()
            if k > 1:
                self.state, stats = self._fused_train_step(
                    self.state, item, self.dropout_rng
                )
            else:
                self.state, stats = self._train_step(
                    self.state, item, self.dropout_rng
                )
            if timed:
                np.asarray(stats["loss"])  # settle this dispatch
                step_times.append((time.time() - t_step) / k)
            losses.append(stats["loss"])
            cms.append(stats["confusion"])
            it_done += k
            # verbose=0 (or None) = silent: no per-iter reports, no division
            if verbose and it_done // verbose > last_report // verbose:
                last_report = it_done
                flat_losses = self._flat_scalars(losses)
                cm = np.sum(
                    [self._flat_cm(c) for c in cms[-max(verbose // k, 1):]],
                    axis=0,
                )
                pm = M.confusion_to_point_metrics(cm)
                iters_left = (epochs - epoch) * iters - it_done
                mean_iter = (time.time() - t_start) / max(
                    self._global_iter + it_done, 1
                )
                eta = decode_eta(mean_iter * iters_left)
                self._say(
                    ITER_REPORT.format(
                        epoch=epoch + 1,
                        epochs=epochs,
                        iter=it_done,
                        iters=iters,
                        loss=float(np.mean(flat_losses[-verbose:])),
                        point_acc=pm["point_acc"],
                        point_miou=pm["point_miou"],
                        fetch=float(np.mean(fetch_times[-max(verbose // k, 1):])),
                        step=step_times[-1] if step_times else 0.0,
                        eta_h=eta["h"],
                        eta_m=eta["m"],
                        eta_s=eta["s"],
                    ),
                    flush=True,
                )
            last = time.time()
        self._global_iter += iters
        flat_losses = self._flat_scalars(losses)
        cm_total = (
            np.sum([self._flat_cm(c) for c in cms], axis=0)
            if cms
            else np.zeros((self.num_classes, self.num_classes))
        )
        out = (
            {"loss": float(np.mean(flat_losses))}
            if len(flat_losses)
            else {"loss": float("nan")}
        )
        out.update(M.confusion_to_point_metrics(cm_total))
        return out

    @staticmethod
    def _flat_scalars(xs) -> np.ndarray:
        """Flatten a mixed list of scalars and (K,) stacked stats."""
        if not xs:
            return np.zeros((0,), np.float32)
        return np.concatenate([np.asarray(x).reshape(-1) for x in xs])

    @staticmethod
    def _flat_cm(c) -> np.ndarray:
        """(K, C, C) group confusion -> (C, C); (C, C) passes through."""
        a = np.asarray(c)
        return a.sum(axis=0) if a.ndim == 3 else a

    def _run_train_epoch(self, epoch, epochs, verbose, t_start):
        if self._fused_train_step is not None:
            return self._run_train_epoch_fused(epoch, epochs, verbose, t_start)
        losses, cms = [], []
        fetch_times, step_times = [], []
        iters = len(self.train_loader)
        last = time.time()
        for it, batch in enumerate(
            prefetch_to_device(iter(self.train_loader), place=self._place_item)
        ):
            now = time.time()
            fetch_times.append(now - last)
            timed = bool(verbose) and (it + 1) % verbose == 0
            if timed:
                # Drain the async dispatch queue BEFORE the timed step so the
                # measurement is one true device step, not the whole async
                # window since the last fetch (the reference reports a real
                # forward+backward split, lib/solver.py:214-230; we report one
                # settled fwd+bwd+update step per verbose window instead).
                # Sync points FETCH a scalar: on the axon tunnel backend
                # block_until_ready returns before execution finishes
                # (CLAUDE.md / bench.py), which would make this ~dispatch
                # latency instead of a step time.
                np.asarray(self.state.step)  # output of the newest step
                t_step = time.time()
            self.state, stats = self._train_step(self.state, batch, self.dropout_rng)
            losses.append(stats["loss"])
            cms.append(stats["confusion"])
            if timed:
                float(np.asarray(stats["loss"]))
                step_times.append(time.time() - t_step)
                window = losses[-verbose:]
                cm = np.sum([np.asarray(c) for c in cms[-verbose:]], axis=0)
                pm = M.confusion_to_point_metrics(cm)
                iters_left = (epochs - epoch) * iters - (it + 1)
                mean_iter = (time.time() - t_start) / max(self._global_iter + it + 1, 1)
                eta = decode_eta(mean_iter * iters_left)
                self._say(
                    ITER_REPORT.format(
                        epoch=epoch + 1,
                        epochs=epochs,
                        iter=it + 1,
                        iters=iters,
                        loss=float(np.mean([np.asarray(l) for l in window])),
                        point_acc=pm["point_acc"],
                        point_miou=pm["point_miou"],
                        fetch=float(np.mean(fetch_times[-verbose:])),
                        step=step_times[-1],
                        eta_h=eta["h"],
                        eta_m=eta["m"],
                        eta_s=eta["s"],
                    ),
                    flush=True,
                )
            last = time.time()
        self._global_iter += iters
        cm_total = np.sum([np.asarray(c) for c in cms], axis=0) if cms else np.zeros(
            (self.num_classes, self.num_classes)
        )
        out = {"loss": float(np.mean([np.asarray(l) for l in losses]))} if losses else {"loss": float("nan")}
        out.update(M.confusion_to_point_metrics(cm_total))
        return out

    # -------------------------------------------------------------------- val

    def _val_batches(self):
        """(host, placed) batch pairs: the eval step consumes the placed
        global batch; host-side voxel metrics read THIS process's rows from
        the host copy (in multi-process runs np.asarray on a dp-sharded
        global array would fail — rows on other hosts aren't addressable)."""
        return prefetch_to_device(
            iter(self.val_loader), place=lambda b: (b, self._place_item(b))
        )

    def _run_val_epoch(self):
        losses, cms = [], []
        vox_accs, vox_mious, vox_cali = [], [], []
        for host, placed in self._val_batches():
            out = self._eval_step(self.state, placed)
            losses.append(out["loss"])
            cms.append(out["confusion"])
            if self.compute_voxel_metrics:
                real = np.asarray(host["row_mask"]) > 0
                coords = np.asarray(host["points"])[real][..., :3].reshape(-1, 3)
                preds = self._local_preds(out["preds"])[real].reshape(-1)
                targets = np.asarray(host["labels"])[real].reshape(-1)
                weights = np.asarray(host["weights"])[real].reshape(-1)
                # fused: one dedup+voxelization for both metric families
                (
                    (_, _, voxacc, voxacc_pc, cali, acc_mask),
                    (_, voxmiou, miou_mask),
                ) = M.compute_scene_metrics(
                    coords, preds, targets, weights, self.num_classes
                )
                vox_accs.append(voxacc)
                vox_cali.append(cali)
                vox_mious.append(np.sum(voxmiou * miou_mask) / max(np.sum(miou_mask), 1))
        if not cms:
            raise RuntimeError("validation produced no batches; check batch_size vs dataset size")
        cm_total = np.sum([np.asarray(c) for c in cms], axis=0)
        stats = {"loss": float(np.mean([np.asarray(l) for l in losses]))}
        stats.update(M.confusion_to_point_metrics(cm_total))
        return self._finish_voxel_stats(stats, vox_accs, vox_cali, vox_mious)

    def _finish_voxel_stats(self, stats, vox_accs, vox_cali, vox_mious):
        """Fold host-computed voxel metrics into the val stats. loss/confusion
        are already global (psum'd on device); the voxel accumulators are
        per-PROCESS batch lists, so multi-host runs sum them across processes
        — every process then gates best-model on identical numbers."""
        if self.compute_voxel_metrics:
            sums = self.ctx.sum_across_processes(
                np.array(
                    [np.sum(vox_accs), np.sum(vox_cali), np.sum(vox_mious),
                     len(vox_mious)],
                    np.float64,
                )
            )
            if sums[3] > 0:
                stats["voxel_acc"] = float(sums[0] / sums[3])
                stats["voxel_acc_calibrated"] = float(sums[1] / sums[3])
                stats["voxel_miou"] = float(sums[2] / sums[3])
                return stats
        # fall back to point mIoU for best-model gating
        stats["voxel_miou"] = stats["point_miou"]
        return stats


class _SceneBatchIterator:
    """Pads a scene's column stack to a multiple of the micro-batch size and
    yields fixed-shape micro-batches with row masks."""

    def __init__(self, dataset, batch_size: int):
        self.dataset = dataset
        self.batch_size = batch_size

    def __len__(self) -> int:
        return len(self.dataset)

    def scenes(self):
        for i in range(len(self.dataset)):
            feats, labels, weights = self.dataset.get_scene(i)
            yield self.dataset.store.scene_ids[i], self.micro_batches(
                feats, labels, weights
            )

    def micro_batches(self, feats, labels, weights):
        B = self.batch_size
        S = feats.shape[0]
        for start in range(0, S, B):
            f = feats[start : start + B]
            l = labels[start : start + B]
            w = weights[start : start + B]
            real = f.shape[0]
            if real < B:
                pad = B - real
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:], f.dtype)])
                l = np.concatenate([l, np.zeros((pad,) + l.shape[1:], l.dtype)])
                w = np.concatenate([w, np.zeros((pad,) + w.shape[1:], w.dtype)])
            row_mask = np.zeros(B, np.float32)
            row_mask[:real] = 1.0
            yield {
                "points": f,
                "labels": l,
                "weights": w,
                "row_mask": row_mask,
            }


class WholeSceneSolver(Solver):
    """Whole-scene training: ONE optimizer update per scene, the scene's
    1.5m-column stack streamed through fixed-size micro-batches with gradient
    accumulation (the reference's --use_wholescene mode, where the solver
    forwards torch.split chunks of a whole scene and backprops the combined
    loss, lib/solver.py:155-169 + scripts/train.py --use_wholescene).

    train_dataset / val_dataset are WholeSceneDataset instances.

    Multi-process: scenes are NOT sharded across processes (one optimizer
    update per scene is the recipe's semantics — splitting scenes would
    change it); every process iterates the same scene stream and feeds its
    row-slice of each micro-batch (ProcessContext.place_from_global), so the
    micro-batch collective counts line up by construction.
    """

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        from pointnet2_scannet_tpu.parallel.step import (
            make_parallel_accum_step,
            make_parallel_apply_accum,
            make_shardmap_accum_step,
        )

        if self.parallel_strategy == "shard_map_dp":
            self._accum_step = make_shardmap_accum_step(
                self.mesh,
                num_classes=self.num_classes,
                axis_name=self.mesh.axis_names[0],
            )
        else:
            self._accum_step = make_parallel_accum_step(
                self.mesh, num_classes=self.num_classes
            )
        self._apply_accum = make_parallel_apply_accum(self.mesh)

    def _make_loaders(self, train_dataset, val_dataset, tc):
        self.train_loader = _SceneBatchIterator(train_dataset, tc.batch_size)
        self.val_loader = (
            _SceneBatchIterator(val_dataset, tc.batch_size)
            if val_dataset is not None
            else None
        )

    def _place_scene_mb(self, mb):
        """Whole-scene micro-batches are GLOBAL (every process builds the
        same rows); each process places its own row-slice."""
        if self.ctx.num_processes > 1:
            return self.ctx.place_from_global(mb, self.mesh, axis=0)
        return jax.device_put(mb, self.batch_sharding)

    def _steps_per_epoch(self) -> int:
        return len(self.train_loader)  # one update per scene

    def _run_train_epoch(self, epoch, epochs, verbose, t_start):
        # re-draw every scene's column resampling this epoch (the reference
        # resamples per __getitem__ call); the VAL dataset stays at epoch 0
        # so validation tilings are comparable across epochs
        self.train_dataset.set_epoch(epoch + 1)
        losses, cms = [], []
        fetch_times = []
        iters = len(self.train_loader)
        last = time.time()
        for it, (scene_id, micro_batches) in enumerate(self.train_loader.scenes()):
            # host wait for this scene's data (get_scene's per-column
            # resample + weight build happen at the generator yield) — the
            # reference's fetch_time analog for --use_wholescene
            # (lib/dataset.py:293-353 + lib/solver.py:423-441)
            t_iter = time.time()
            fetch_times.append(t_iter - last)
            grads_sum = None
            stats_sum = None
            loss_sum = None
            count_sum = None
            cm_sum = None
            for mi, mb in enumerate(micro_batches):
                mb = self._place_scene_mb(mb)
                grads, new_bs, ls, cnt, cm = self._accum_step(
                    self.state, mb, self.dropout_rng, np.int32(mi)
                )
                self.state = self.state.replace(batch_stats=new_bs)
                if grads_sum is None:
                    grads_sum, loss_sum, count_sum, cm_sum = grads, ls, cnt, cm
                else:
                    grads_sum = jax.tree_util.tree_map(
                        lambda a, b: a + b, grads_sum, grads
                    )
                    loss_sum = loss_sum + ls
                    count_sum = count_sum + cnt
                    cm_sum = cm_sum + cm
            self.state = self._apply_accum(self.state, grads_sum, count_sum)
            loss = float(np.asarray(loss_sum)) / max(float(np.asarray(count_sum)), 1.0)
            losses.append(loss)
            cms.append(np.asarray(cm_sum))
            if verbose and (it + 1) % verbose == 0:
                pm = M.confusion_to_point_metrics(np.sum(cms[-verbose:], axis=0))
                # one "iter" = one scene (one optimizer update); the loss
                # fetch above settled the device, so step is the real
                # accumulate+apply wall time for this scene
                iters_left = (epochs - epoch) * iters - (it + 1)
                mean_iter = (time.time() - t_start) / max(
                    self._global_iter + it + 1, 1
                )
                eta = decode_eta(mean_iter * iters_left)
                self._say(
                    ITER_REPORT.format(
                        epoch=epoch + 1,
                        epochs=epochs,
                        iter=it + 1,
                        iters=iters,
                        loss=float(np.mean(losses[-verbose:])),
                        point_acc=pm["point_acc"],
                        point_miou=pm["point_miou"],
                        fetch=float(np.mean(fetch_times[-verbose:])),
                        step=time.time() - t_iter,
                        eta_h=eta["h"], eta_m=eta["m"], eta_s=eta["s"],
                    ),
                    flush=True,
                )
            last = time.time()
        self._global_iter += iters
        cm_total = np.sum(cms, axis=0) if cms else np.zeros(
            (self.num_classes, self.num_classes)
        )
        out = {"loss": float(np.mean(losses))} if losses else {"loss": float("nan")}
        out.update(M.confusion_to_point_metrics(cm_total))
        return out

    def _run_val_epoch(self):
        losses, cms = [], []
        vox_accs, vox_cali, vox_mious = [], [], []
        for scene_id, micro_batches in self.val_loader.scenes():
            scene_preds, scene_coords, scene_targets, scene_weights = [], [], [], []
            for mb in micro_batches:
                mb_dev = self._place_scene_mb(mb)
                out = self._eval_step(self.state, mb_dev)
                losses.append(out["loss"])
                cms.append(out["confusion"])
                real = mb["row_mask"] > 0
                scene_coords.append(mb["points"][real][..., :3].reshape(-1, 3))
                # scene metrics need the WHOLE scene's preds; in multi-process
                # runs preds are dp-sharded, so gather the full rows (every
                # process then computes identical per-scene metrics)
                scene_preds.append(self.ctx.all_rows(out["preds"])[real].reshape(-1))
                scene_targets.append(mb["labels"][real].reshape(-1))
                scene_weights.append(mb["weights"][real].reshape(-1))
            if self.compute_voxel_metrics and scene_preds:
                coords = np.concatenate(scene_coords)
                preds = np.concatenate(scene_preds)
                targets = np.concatenate(scene_targets)
                weights = np.concatenate(scene_weights)
                # fused: one dedup+voxelization for both metric families
                (
                    (_, _, voxacc, _, cali, _),
                    (_, voxmiou, miou_mask),
                ) = M.compute_scene_metrics(
                    coords, preds, targets, weights, self.num_classes
                )
                vox_accs.append(voxacc)
                vox_cali.append(cali)
                vox_mious.append(
                    np.sum(voxmiou * miou_mask) / max(np.sum(miou_mask), 1)
                )
        if not cms:
            raise RuntimeError("validation produced no batches")
        cm_total = np.sum([np.asarray(c) for c in cms], axis=0)
        stats = {"loss": float(np.mean([np.asarray(l) for l in losses]))}
        stats.update(M.confusion_to_point_metrics(cm_total))
        # NO cross-process fold here (unlike Solver._finish_voxel_stats):
        # whole-scene val computes each scene's metrics from the gathered
        # full-scene preds, so the lists are already identical everywhere
        if self.compute_voxel_metrics and vox_mious:
            stats["voxel_acc"] = float(np.mean(vox_accs))
            stats["voxel_acc_calibrated"] = float(np.mean(vox_cali))
            stats["voxel_miou"] = float(np.mean(vox_mious))
        else:
            stats["voxel_miou"] = stats["point_miou"]
        return stats
