"""Whole-scene evaluation CLI.

Counterpart of the reference evaluator (scripts/eval.py:174-221): loads a
trained checkpoint (model flags come from the serialized config.json, so
they can never drift from training), tiles every val scene into 1.5m columns,
and prints the global + per-class metric table (point acc, per-class point
acc, voxel acc, per-class voxel acc, calibrated voxel acc, point mIoU,
voxel mIoU).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def evaluate(args) -> None:
    # multi-host eval is embarrassingly parallel: no collectives in the
    # forward, so each process evaluates its own scene shard on a LOCAL
    # device mesh and the per-scene results merge once at the end
    from pointnet2_scannet_tpu.parallel.distributed import initialize_distributed

    ctx = initialize_distributed(
        args.dist_coordinator, args.dist_nprocs, args.dist_pid,
        auto=args.dist_auto,
    )

    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import RunConfig
    from pointnet2_scannet_tpu.data import WholeSceneDataset
    from pointnet2_scannet_tpu.data.scene_store import SceneStore
    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
    from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only
    from pointnet2_scannet_tpu.engine.evaluator import WholeSceneEvaluator

    run_dir = pathlib.Path(args.folder)
    cfg = RunConfig.load(run_dir / "config.json")

    if args.synthetic:
        store = make_synthetic_store(args.synthetic_scenes, seed=1000)
        if ctx.num_processes > 1:
            # equalize=False: eval covers EVERY scene (no per-step
            # collectives, so ragged shards can't deadlock anything)
            store = store.shard(ctx.process_id, ctx.num_processes, equalize=False)
    else:
        scene_ids = [l.strip() for l in open(args.val_list or cfg.paths.val_list) if l.strip()]
        mv = cfg.paths.multiview_h5 if cfg.data.use_multiview else None
        if ctx.num_processes > 1:
            store = SceneStore.from_npy_dir_sharded(
                scene_ids,
                args.data_dir or cfg.paths.preprocessed_dir,
                mv,
                process_id=ctx.process_id,
                num_processes=ctx.num_processes,
                is_weighting=cfg.data.is_weighting,
                equalize=False,
                ctx=ctx,
            )
        else:
            store = SceneStore.from_npy_dir(
                scene_ids,
                args.data_dir or cfg.paths.preprocessed_dir,
                mv,
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
        model.apply,
        variables,
        batch_size=args.batch_size,
        ring_slots=args.eval_ring,
        queue_depth=args.eval_depth,
        mesh=_eval_mesh(args, ctx),
    )
    if ctx.num_processes > 1:
        from pointnet2_scannet_tpu.engine.evaluator import (
            pack_scene_results,
            unpack_scene_results,
        )

        C = cfg.model.num_classes
        local = (
            evaluator.evaluate(dataset).scenes if len(store) > 0 else []
        )
        rows = ctx.allgather_ragged(
            pack_scene_results(local, C).reshape(-1, 3 + 6 * C)
        )
        report = evaluator.aggregate(unpack_scene_results(rows, num_classes=C))
        ctx.barrier("eval-merge")
        if not ctx.is_coordinator:
            return
    else:
        report = evaluator.evaluate(dataset)
    print()
    print(report.format_table())
    (run_dir / "eval_report.txt").write_text(report.format_table())


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
    p.add_argument("--checkpoint", type=str, default="model_best")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--val_list", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_scenes", type=int, default=2)
    p.add_argument(
        "--eval_ring", type=int, default=None,
        help="resident scene slots in the device ring (default: auto-sized "
        "from the dataset so steady-state eval never flushes; costs HBM "
        "per slot)",
    )
    p.add_argument(
        "--eval_depth", type=int, default=2,
        help="in-flight device batches in the async eval queue",
    )
    p.add_argument(
        "--num_devices", type=int, default=None,
        help="data-parallel eval width: batch rows shard over a dp mesh, "
        "the scene ring replicates, and each device runs its own Pallas "
        "geometry kernels on its row shard (1 = single device); in "
        "distributed eval this is PER-PROCESS (local devices)",
    )
    # multi-host eval: scenes shard across processes (every scene covered —
    # no equal-count truncation), each process evaluates independently on
    # local devices, per-scene results merge at the end, coordinator prints
    p.add_argument("--dist_coordinator", type=str, default=None)
    p.add_argument("--dist_nprocs", type=int, default=1)
    p.add_argument("--dist_pid", type=int, default=0)
    p.add_argument(
        "--dist_auto", action="store_true",
        help="discover coordinator/count/id from the runtime (TPU pod "
        "metadata, SLURM) instead of the explicit --dist_* flags",
    )
    return p.parse_args(argv)


if __name__ == "__main__":
    evaluate(parse_args())
