"""Production-scale host-pipeline rehearsal — VERDICT r3 #3.

The real ScanNet recipe is 1201 train scenes x <=100k points with per-epoch
chunk regeneration (reference startup + per-epoch host hot spots:
lib/dataset.py:29-58 load, :204-252 regen). Every test and bench before this
ran <=16 scenes, so "regen overlaps device compute" was extrapolated. This
script measures the host pipeline AT SCALE, printing one JSON line per probe:

  1. scene-store materialization: write/load 1201 .npy scenes (~5.3 GB),
     `SceneStore.from_npy_dir` wall + RSS — the reference's startup cost
  2. `from_npy_dir_sharded` (pod loading): shard-0-of-2 wall incl. the
     streaming GLOBAL label-weights pass that never holds off-shard scenes
  3. per-epoch chunk regen (native chunk_scan) cold wall at 1201 scenes,
     and one full host-side BatchLoader epoch (collate + augmentation)
  4. (unless --host_only) a real chunked-Solver run: per-epoch wall,
     steps/sec stability, and the measured regen join-wait — the time the
     epoch boundary actually BLOCKS on host chunking after async overlap

Scenes are cached under --store so reruns skip generation. Generation uses a
vectorized generator (make_synthetic_scene's per-point color loop costs
seconds/scene at 100k pts; the pipeline only needs coords/labels structure).

Run host-only probes anywhere; the solver probe wants the real TPU:
  python -u scripts/bench_hostpipe.py --host_only          # ~5 min cold
  python -u scripts/bench_hostpipe.py --epochs 3           # + TPU epochs
"""

from __future__ import annotations

import argparse
import json
import pathlib
import resource
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def emit(metric: str, value: float, unit: str, **extra) -> None:
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit, **extra}), flush=True)


def fast_scene(seed: int, n_points: int) -> np.ndarray:
    """Vectorized synthetic scene in the (N, 11) preprocessed layout:
    floor plane + furniture boxes, class-correlated colors. Structure-only
    stand-in for make_synthetic_scene (which costs seconds/scene at 100k)."""
    rng = np.random.default_rng(seed)
    n_floor = n_points // 3
    n_rest = n_points - n_floor
    xyz_floor = np.column_stack(
        [rng.uniform(0, 8, n_floor), rng.uniform(0, 8, n_floor), rng.normal(0, 0.01, n_floor)]
    )
    lab_floor = np.zeros(n_floor, np.float32)
    # furniture: cluster points around box centers
    n_obj = 12
    centers = rng.uniform(0.5, 7.5, (n_obj, 3)) * [1, 1, 0.2]
    obj_of = rng.integers(0, n_obj, n_rest)
    xyz_rest = centers[obj_of] + rng.uniform(-0.5, 0.5, (n_rest, 3))
    lab_rest = ((obj_of * 7) % 18 + 2).astype(np.float32)
    xyz = np.vstack([xyz_floor, xyz_rest]).astype(np.float32)
    labels = np.concatenate([lab_floor, lab_rest])
    colors = (labels[:, None] * [53.0, 101.0, 181.0] % 256 + rng.normal(0, 8, (n_points, 3))).clip(0, 255)
    normals = np.zeros((n_points, 3), np.float32)
    normals[:, 2] = 1.0
    inst = np.concatenate([np.zeros(n_floor), obj_of + 1]).astype(np.float32)
    scene = np.column_stack([xyz, colors, normals, inst, labels]).astype(np.float32)
    return scene[rng.permutation(n_points)]


def materialize(store_dir: pathlib.Path, n_scenes: int, n_points: int) -> list[str]:
    store_dir.mkdir(parents=True, exist_ok=True)
    ids = [f"hp{idx:04d}_00" for idx in range(n_scenes)]
    missing = [sid for sid in ids if not (store_dir / f"{sid}.npy").exists()]
    if missing:
        t0 = time.perf_counter()
        for k, sid in enumerate(missing):
            np.save(store_dir / f"{sid}.npy", fast_scene(hash(sid) % 2**31, n_points))
        emit("hostpipe_scene_gen_wall", time.perf_counter() - t0, "sec",
             scenes=len(missing), points=n_points)
    return ids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=1201)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--npoints", type=int, default=8192)
    ap.add_argument("--store", type=str, default="/tmp/hostpipe_scenes")
    ap.add_argument("--host_only", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--device_store", action="store_true",
        help="solver probe uses the device-resident scene store "
        "(train-side descriptor dispatch, data/resident.py)",
    )
    ap.add_argument("--fused_steps", type=int, default=1)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pointnet2_scannet_tpu.config import DataConfig
    from pointnet2_scannet_tpu.data import ChunkedSceneDataset
    from pointnet2_scannet_tpu.data.pipeline import BatchLoader
    from pointnet2_scannet_tpu.data.scene_store import SceneStore

    store_dir = pathlib.Path(args.store)
    ids = materialize(store_dir, args.scenes, args.points)

    # --- 1. startup: full load (the reference holds all scenes in RAM too)
    rss0 = rss_gb()
    t0 = time.perf_counter()
    store = SceneStore.from_npy_dir(ids, store_dir)
    emit("hostpipe_store_load_wall", time.perf_counter() - t0, "sec",
         scenes=len(ids), rss_gb=round(rss_gb() - rss0, 2),
         ref="lib/dataset.py:29-58 startup")

    # --- 2. pod loading: shard 0 of 2 with the streaming global-weights pass
    t0 = time.perf_counter()
    shard = SceneStore.from_npy_dir_sharded(ids, store_dir, process_id=0, num_processes=2)
    emit("hostpipe_sharded_load_wall", time.perf_counter() - t0, "sec",
         shard_scenes=len(shard.scene_ids),
         weights_match=bool(np.allclose(shard.label_weights, store.label_weights)))
    del shard

    # --- 3. per-epoch host costs at scale
    cfg = DataConfig(npoints=args.npoints, use_color=True, use_normal=True)
    ds = ChunkedSceneDataset(store, cfg, phase="train", seed=0)
    t0 = time.perf_counter()
    ds.generate_chunks()
    regen_wall = time.perf_counter() - t0
    emit("hostpipe_chunk_regen_wall", regen_wall, "sec", scenes=len(ids),
         per_scene_ms=round(regen_wall / len(ids) * 1e3, 3),
         ref="lib/dataset.py:204-252 per-epoch regen")

    loader = BatchLoader(ds, min(args.batch_size, len(ids)), seed=0, drop_last=True)
    t0 = time.perf_counter()
    n_items = 0
    for batch in loader:
        n_items += len(batch["points"])
    host_epoch_wall = time.perf_counter() - t0
    emit("hostpipe_collate_epoch_wall", host_epoch_wall, "sec",
         items_per_sec=round(n_items / max(host_epoch_wall, 1e-9), 1), steps=len(loader),
         note="host-side assemble+augment+collate for one epoch, no device")

    if args.host_only:
        emit("hostpipe_peak_rss", rss_gb(), "GB")
        return

    # --- 4. the real Solver at scale: does async regen actually hide?
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import ModelConfig, RunConfig, TrainConfig
    from pointnet2_scannet_tpu.engine import Solver
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    class TimedDataset(ChunkedSceneDataset):
        """Records what the epoch boundary BLOCKS on (join-wait after async
        overlap) and what the background regen costs in wall time."""

        join_waits: list[float]
        regen_walls: list[float]

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.join_waits, self.regen_walls = [], []

        def generate_chunks(self):
            t0 = time.perf_counter()
            super().generate_chunks()
            self.join_waits.append(time.perf_counter() - t0)

        def _generate(self):
            t0 = time.perf_counter()
            out = super()._generate()
            self.regen_walls.append(time.perf_counter() - t0)
            return out

    run_cfg = RunConfig(
        tag="hostpipe",
        data=cfg,
        model=ModelConfig(is_msg=False),
        train=TrainConfig(
            batch_size=args.batch_size, epochs=args.epochs, lr=1e-3,
            verbose=1000, seed=0, device_store=args.device_store,
            fused_steps=args.fused_steps,
        ),
    )
    train_ds = TimedDataset(store, cfg, phase="train", seed=0)
    val_store = SceneStore.from_npy_dir(ids[:16], store_dir)
    val_ds = ChunkedSceneDataset(val_store, cfg, phase="val", seed=1)
    model = models.get_model(
        num_classes=run_cfg.model.num_classes, is_msg=False,
        input_channels=cfg.input_channels,
    )
    out = pathlib.Path("/tmp/hostpipe_run")
    out.mkdir(exist_ok=True)

    solver = Solver(model, train_ds, val_ds, run_cfg, out)

    # per-epoch walls via the logger (one solver call keeps async regen live:
    # the epoch loop only overlaps regen when it owns the next epoch)
    marks = []
    orig_add = solver.logger.add_scalars

    def add_scalars(group, stats, epoch):
        if group == "train":
            marks.append(time.perf_counter())
        return orig_add(group, stats, epoch)

    solver.logger.add_scalars = add_scalars
    t_all = time.perf_counter()
    solver(epochs=args.epochs, verbose=1000)
    total = time.perf_counter() - t_all
    bounds = [t_all] + marks
    epoch_walls = [b - a for a, b in zip(bounds, bounds[1:])]

    steps = len(solver.train_loader)
    pts_per_epoch = steps * args.batch_size * args.npoints
    # epoch 0 carries the compiles; steady state = later epochs
    steady = epoch_walls[1:] if len(epoch_walls) > 1 else epoch_walls
    emit(
        "hostpipe_train_points_per_sec",
        pts_per_epoch / float(np.median(steady)),
        "points/sec",
        steps_per_epoch=steps,
        epoch_walls=[round(w, 2) for w in epoch_walls],
        regen_join_wait_s=[round(w, 3) for w in train_ds.join_waits],
        regen_background_wall_s=[round(w, 3) for w in train_ds.regen_walls],
        peak_rss_gb=round(rss_gb(), 2),
        total_wall=round(total, 1),
    )


if __name__ == "__main__":
    main()
