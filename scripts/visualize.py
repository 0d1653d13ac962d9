"""Prediction visualization CLI.

Counterpart of the reference visualizer (scripts/visualize.py:75-140):
whole-scene prediction for one scene (or all), coordinate dedup, palette
coloring, PLY output under <run_dir>/preds/<scene_id>.ply.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def visualize(args) -> None:
    # multi-host: like distributed eval, visualization is embarrassingly
    # parallel — scenes shard RAGGED across processes and each process
    # writes ITS scenes' PLYs (outputs are per-scene files, so no write
    # gating or merge is needed; the preds/ dir is shared)
    from pointnet2_scannet_tpu.parallel.distributed import initialize_distributed

    ctx = initialize_distributed(
        args.dist_coordinator, args.dist_nprocs, args.dist_pid,
        auto=args.dist_auto,
    )

    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import PALETTE, RunConfig
    from pointnet2_scannet_tpu.data import WholeSceneDataset
    from pointnet2_scannet_tpu.data.scene_store import SceneStore
    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
    from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only
    from pointnet2_scannet_tpu.engine.evaluator import WholeSceneEvaluator
    from pointnet2_scannet_tpu.engine.metrics import filter_points
    from pointnet2_scannet_tpu.utils.ply import write_ply_points

    run_dir = pathlib.Path(args.folder)
    cfg = RunConfig.load(run_dir / "config.json")

    if args.synthetic:
        store = make_synthetic_store(1, seed=1000)
        if ctx.num_processes > 1:
            store = store.shard(ctx.process_id, ctx.num_processes, equalize=False)
    else:
        scene_ids = [args.scene_id] if args.scene_id else [
            l.strip() for l in open(cfg.paths.val_list) if l.strip()
        ]
        mv = cfg.paths.multiview_h5 if cfg.data.use_multiview else None
        if ctx.num_processes > 1:
            store = SceneStore.from_npy_dir_sharded(
                scene_ids, args.data_dir or cfg.paths.preprocessed_dir, mv,
                process_id=ctx.process_id, num_processes=ctx.num_processes,
                is_weighting=cfg.data.is_weighting, equalize=False, ctx=ctx,
            )
        else:
            store = SceneStore.from_npy_dir(
                scene_ids, args.data_dir or cfg.paths.preprocessed_dir, mv,
                is_weighting=cfg.data.is_weighting,
            )

    dataset = WholeSceneDataset(store, cfg.data, seed=0)
    import jax.numpy as jnp

    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
        use_xyz=cfg.model.use_xyz,
        bn=cfg.model.bn,
        dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None,
    )
    variables = restore_params_only(run_dir, args.checkpoint)
    evaluator = WholeSceneEvaluator(
        model.apply, variables, batch_size=args.batch_size,
        ring_slots=args.eval_ring, queue_depth=args.eval_depth,
        mesh=_eval_mesh(args, ctx),
    )

    preds_dir = run_dir / "preds"
    preds_dir.mkdir(exist_ok=True)
    palette = np.asarray(PALETTE, np.uint8)

    # streamed through the evaluator's descriptor pipeline: each scene's
    # features+indices upload once, forwards pack across scene boundaries,
    # and the dedup+PLY write runs on the worker pool overlapped with the
    # remaining forwards (same machinery as evaluate(), scene_fn swapped)
    def write_scene(scene_id, coords, labels, weights, preds):
        coords_u, preds_u, _, _ = filter_points(
            coords.reshape(-1, 3), preds.reshape(-1),
            labels.reshape(-1), weights.reshape(-1),
        )
        colors = palette[np.clip(preds_u, 0, len(palette) - 1)]
        out = preds_dir / f"{scene_id}.ply"
        write_ply_points(out, coords_u, colors)
        return out, len(coords_u)

    evaluator.map_scenes(
        dataset, write_scene,
        progress=lambda r: print(f"wrote {r[0]} ({r[1]} points)"),
    )
    ctx.barrier("visualize-end")


def _eval_mesh(args, ctx):
    from pointnet2_scannet_tpu.parallel.mesh import (
        dp_mesh_or_none,
        local_dp_mesh_or_none,
    )

    if ctx.num_processes > 1:
        return local_dp_mesh_or_none(
            getattr(args, "num_devices", None), batch_size=args.batch_size
        )
    return dp_mesh_or_none(
        getattr(args, "num_devices", None), batch_size=args.batch_size
    )


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder", type=str, required=True, help="run output dir")
    p.add_argument("--scene_id", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default="model_best")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--eval_ring", type=int, default=None,
                   help="resident scene slots in the device ring (default: auto)")
    p.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel eval width (batch rows shard over a "
                   "dp mesh; 1 = single device)")
    p.add_argument("--eval_depth", type=int, default=2,
                   help="in-flight device batches in the async queue")
    # multi-host: ragged scene shards; each process writes its scenes' PLYs
    p.add_argument("--dist_coordinator", type=str, default=None)
    p.add_argument("--dist_nprocs", type=int, default=1)
    p.add_argument("--dist_pid", type=int, default=0)
    p.add_argument("--dist_auto", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    visualize(parse_args())
