"""Training CLI.

Flag-for-flag counterpart of the reference trainer (scripts/train.py:108-129):
tag/batch_size/epoch/verbose/lr/wd/ds/df/debug/no_weighting/no_bn/no_xyz/
use_msg/use_color/use_normal/use_multiview, plus TPU-specific --num_devices
and --synthetic (train on generated scenes when no ScanNet data is mounted).
Writes outputs/<timestamp>_<TAG>/ with config.json, info.json, checkpoints,
tensorboard scalars, and best.txt.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_config(args) -> "RunConfig":
    from pointnet2_scannet_tpu.config import (
        DataConfig,
        ModelConfig,
        PathConfig,
        RunConfig,
        TrainConfig,
    )

    return RunConfig(
        tag=args.tag,
        paths=PathConfig(
            preprocessed_dir=args.data_dir,
            multiview_h5=args.multiview_h5,
            output_root=args.output_root,
            train_list=args.train_list,
            val_list=args.val_list,
        ),
        data=DataConfig(
            npoints=args.npoints,
            is_weighting=not args.no_weighting,
            use_color=args.use_color,
            use_normal=args.use_normal,
            use_multiview=args.use_multiview,
        ),
        model=ModelConfig(
            is_msg=args.use_msg,
            use_xyz=not args.no_xyz,
            bn=not args.no_bn,
            compute_dtype="bfloat16" if args.bf16 else "float32",
        ),
        train=TrainConfig(
            batch_size=args.batch_size,
            epochs=args.epoch if args.epoch is not None else 500,
            lr=args.lr,
            weight_decay=args.wd,
            decay_step=args.ds,
            decay_factor=args.df,
            verbose=args.verbose if args.verbose is not None else 10,
            seed=args.seed,
            no_weighting=args.no_weighting,
            num_devices=args.num_devices,
            tp=args.tp if args.tp is not None else 1,
            shuffle=args.shuffle,
            device_store=args.device_store,
            fused_steps=args.fused_steps,
            wholescene=args.use_wholescene,
            synthetic=args.synthetic,
            synthetic_scenes=args.synthetic_scenes,
            debug=args.debug,
        ),
    )


def load_scene_list(path: str) -> list[str]:
    return [l.strip() for l in open(path) if l.strip()]


def make_stores(cfg, ctx):
    from pointnet2_scannet_tpu.data.scene_store import SceneStore
    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store

    # multi-host chunked training: each process keeps a disjoint scene shard
    # with the GLOBAL split's label weights. Whole-scene mode instead
    # iterates every scene on every process and row-slices the micro-batches
    # (WholeSceneSolver docstring), so it keeps full stores.
    shard_stores = ctx.num_processes > 1 and not cfg.train.wholescene

    if cfg.train.synthetic:
        n = cfg.train.synthetic_scenes
        train_store = make_synthetic_store(n, seed=0)
        val_store = make_synthetic_store(max(n // 4, 1), seed=1000)
        if shard_stores:
            _warn_dropped(ctx, len(train_store), "train")
            _warn_dropped(ctx, len(val_store), "val")
            train_store = train_store.shard(ctx.process_id, ctx.num_processes)
            val_store = val_store.shard(ctx.process_id, ctx.num_processes)
        return train_store, val_store

    train_ids = load_scene_list(cfg.paths.train_list)
    val_ids = load_scene_list(cfg.paths.val_list)
    if cfg.train.debug:
        # the reference --debug trains and validates on one scene
        # (scripts/train.py:72-74)
        train_ids = train_ids[:1]
        val_ids = train_ids
    mv = cfg.paths.multiview_h5 if cfg.data.use_multiview else None
    if shard_stores:
        # load only this process's shard into RAM; weights stream over the
        # whole split's label columns (SceneStore.from_npy_dir_sharded)
        _warn_dropped(ctx, len(train_ids), "train")
        _warn_dropped(ctx, len(val_ids), "val")
        make = lambda ids: SceneStore.from_npy_dir_sharded(  # noqa: E731
            ids, cfg.paths.preprocessed_dir, mv,
            process_id=ctx.process_id, num_processes=ctx.num_processes,
            is_weighting=cfg.data.is_weighting, ctx=ctx,
        )
        return make(train_ids), make(val_ids)
    train_store = SceneStore.from_npy_dir(
        train_ids, cfg.paths.preprocessed_dir, mv, is_weighting=cfg.data.is_weighting
    )
    val_store = SceneStore.from_npy_dir(
        val_ids, cfg.paths.preprocessed_dir, mv, is_weighting=cfg.data.is_weighting
    )
    return train_store, val_store


def _warn_dropped(ctx, count: int, name: str) -> None:
    if ctx.is_coordinator and count % ctx.num_processes:
        print(
            f"multi-host: dropping {count % ctx.num_processes} trailing "
            f"{name} scene(s) to equalize per-process shards",
            flush=True,
        )


def train(args) -> None:
    # multi-host: join the processes BEFORE anything touches devices —
    # afterwards jax.devices() is the GLOBAL list and the dp mesh spans it
    from pointnet2_scannet_tpu.parallel.distributed import initialize_distributed

    ctx = initialize_distributed(
        args.dist_coordinator, args.dist_nprocs, args.dist_pid,
        auto=args.dist_auto,
    )
    if ctx.num_processes > 1 and args.num_devices is not None:
        raise SystemExit(
            "--num_devices cannot be combined with multi-host flags: the "
            "global mesh must span every process's devices (a truncated mesh "
            "would leave some processes outside the collectives and hang)"
        )
    if args.device_store and args.no_device_store:
        raise SystemExit("--device_store and --no_device_store conflict")

    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.data import ChunkedSceneDataset, WholeSceneDataset
    from pointnet2_scannet_tpu.engine import Solver
    from pointnet2_scannet_tpu.engine.solver import WholeSceneSolver

    if args.resume:
        from pointnet2_scannet_tpu.config import RunConfig

        output_dir = pathlib.Path(args.resume)
        cfg = RunConfig.load(output_dir / "config.json")
        # run MODE comes from the saved config, never re-typed CLI flags —
        # a whole-scene run resumed without --use_wholescene must not
        # silently continue as a chunked run (and vice versa)
        for flag, saved in (
            ("use_wholescene", cfg.train.wholescene),
            ("synthetic", cfg.train.synthetic),
            ("debug", cfg.train.debug),
        ):
            if getattr(args, flag) and not saved:
                raise SystemExit(
                    f"--{flag} passed but the resumed run was not a "
                    f"{flag} run (config.json disagrees)"
                )
        # EXECUTION flags may be overridden at the resume CLI (same rule as
        # the shape trainers): --epoch EXTENDS the run, --verbose /
        # --num_devices adapt to the resuming host; the model/data/optimizer
        # recipe always comes from the saved config
        import dataclasses as _dc

        overrides = {}
        if args.num_devices is not None:
            overrides["num_devices"] = args.num_devices
        if args.tp is not None:
            # execution-layout flag like --num_devices: the resuming host may
            # have a different chip count than the one that saved the run
            overrides["tp"] = args.tp
        if ctx.num_processes > 1:
            # a saved single-host device count (e.g. num_devices=1 or 4)
            # would build a mesh on host 0's chips only — process 1+ would
            # own no mesh devices and the collectives would hang. The mesh
            # must span the pod; None = all global devices.
            overrides["num_devices"] = None
        if args.verbose is not None:
            overrides["verbose"] = args.verbose
        if args.device_store:
            # execution-layout flag: identical math to the host collate path
            # (the Solver falls back with a warning if the resuming host's
            # run shape doesn't support it)
            overrides["device_store"] = True
        elif args.no_device_store:
            overrides["device_store"] = False
        if args.epoch is not None:
            overrides["epochs"] = max(args.epoch, cfg.train.epochs)
        if overrides:
            cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, **overrides))
    else:
        cfg = build_config(args)
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        if args.tag:
            stamp += "_" + args.tag.upper()
        output_dir = pathlib.Path(cfg.paths.output_root) / stamp
        if ctx.is_coordinator:  # non-coordinators never write run artifacts
            output_dir.mkdir(parents=True, exist_ok=True)

    train_store, val_store = make_stores(cfg, ctx)
    if cfg.train.wholescene:
        # whole-scene training: one gradient-accumulated update per scene
        # (reference --use_wholescene, scripts/train.py:23 + solver.py:155-169)
        train_ds = WholeSceneDataset(train_store, cfg.data, seed=args.seed)
        val_ds = WholeSceneDataset(val_store, cfg.data, seed=args.seed + 1)
        solver_cls = WholeSceneSolver
    else:
        train_ds = ChunkedSceneDataset(
            train_store, cfg.data, phase="train", seed=args.seed
        )
        val_ds = ChunkedSceneDataset(val_store, cfg.data, phase="val", seed=args.seed + 1)
        solver_cls = Solver

    import jax.numpy as jnp

    from pointnet2_scannet_tpu.parallel.mesh import make_mesh, make_mesh_2d

    # build the mesh BEFORE the model: on a dp-only multi-device mesh the
    # model gets bn_axis_name=<dp axis> so the Solver selects the shard_map
    # step (each chip traces its own Pallas geometry kernels on its batch
    # shard; see parallel/step.py make_shardmap_train_step). --tp>1 builds a
    # (dp, tp) 2-D mesh instead — Dense kernels + Adam moments tp-sharded,
    # Solver strategy "gspmd_dp_tp"; BN pmean is dp-only so bn_axis stays None.
    tp = max(int(getattr(cfg.train, "tp", 1) or 1), 1)
    if tp > 1:
        if ctx.num_processes > 1:
            raise SystemExit("--tp is single-host (dp-only meshes across hosts)")
        import jax as _jax

        n_dev = cfg.train.num_devices or len(_jax.devices())
        if n_dev % tp:
            raise SystemExit(f"--tp {tp} does not divide num_devices {n_dev}")
        dp = n_dev // tp
        if cfg.train.batch_size % max(dp, 1):
            raise SystemExit(
                f"batch_size {cfg.train.batch_size} not divisible by dp={dp}"
            )
        mesh = make_mesh_2d(dp, tp)
        bn_axis = None
    else:
        mesh = make_mesh(cfg.train.num_devices, batch_size=cfg.train.batch_size)
        bn_axis = mesh.axis_names[0] if mesh.size > 1 else None
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
        use_xyz=cfg.model.use_xyz,
        bn=cfg.model.bn,
        dtype=jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else None,
        bn_axis_name=bn_axis,
    )
    solver = solver_cls(
        model, train_ds, val_ds, cfg, output_dir, mesh=mesh, process_ctx=ctx,
        trace_dir=args.trace,
    )
    if ctx.is_coordinator:
        print(
            f"parallel strategy: {solver.parallel_strategy} "
            f"(mesh size {mesh.size}, processes {ctx.num_processes})"
        )
        info = {
            **vars(args),
            "num_train_scenes": len(train_store),
            "num_val_scenes": len(val_store),
            "num_params": int(
                sum(np.prod(p.shape) for p in _leaves(solver.state.params))
            ),
        }
        (output_dir / "info.json").write_text(json.dumps(info, indent=2, default=str))

    start_epoch = solver.resume() if args.resume else 0
    if ctx.is_coordinator:
        print(f"training -> {output_dir} (from epoch {start_epoch})")
    best = solver(start_epoch=start_epoch)
    # all processes reach the end together before the coordinator's files are
    # read by anything downstream (and before jax.distributed tears down)
    ctx.barrier("train-end")
    if ctx.is_coordinator:
        print("best:", best)


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tag", type=str, default="", help="run tag for the output dir")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument(
        "--epoch", type=int, default=None,
        help="epochs to train (default 500); at --resume, EXTENDS the run "
        "past its saved epoch count",
    )
    p.add_argument(
        "--verbose", type=int, default=None,
        help="iters between reports (default 10; overridable at --resume)",
    )
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--ds", type=int, default=100, help="lr decay step (epochs)")
    p.add_argument("--df", type=float, default=0.7, help="lr decay factor")
    p.add_argument("--npoints", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--debug", action="store_true", help="train on a single scene")
    p.add_argument("--no_weighting", action="store_true")
    p.add_argument("--no_bn", action="store_true")
    p.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 compute dtype for the pointwise MLPs (params stay f32)",
    )
    p.add_argument("--no_xyz", action="store_true")
    p.add_argument("--use_msg", action="store_true")
    p.add_argument("--use_wholescene", action="store_true")
    p.add_argument("--use_color", action="store_true")
    p.add_argument("--use_normal", action="store_true")
    p.add_argument("--use_multiview", action="store_true")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument(
        "--tp", type=int, default=None,
        help="tensor-parallel width: >1 builds a (dp, tp) 2-D mesh with "
        "Dense kernels + Adam moments sharded over tp (GSPMD inserts the "
        "ICI collectives). Single-host only; num_devices must divide by tp",
    )
    p.add_argument(
        "--trace", type=str, default=None, metavar="DIR",
        help="capture a jax.profiler trace (TensorBoard/XProf timeline) of "
        "one train epoch into DIR — the second epoch when there is one, so "
        "the jit compiles stay out of the steady-state timeline",
    )
    p.add_argument(
        "--shuffle", action="store_true",
        help="shuffle scene order across train batches each epoch (the "
        "reference keeps a FIXED order, scripts/train.py:26 — identical "
        "batch scene-composition every epoch; parity default off)",
    )
    p.add_argument(
        "--device_store", action="store_true",
        help="keep the whole train split's assembled features + labels "
        "resident in HBM and ship only (B, npoints) row indices + "
        "augmentation params per step — the gather/augment/weight-lookup "
        "run inside the jitted step (~9x less host->device traffic, no host "
        "collate; identical math to the host path). Single-process dp-only "
        "chunked runs; auto-falls back with a warning otherwise",
    )
    p.add_argument(
        "--no_device_store", action="store_true",
        help="force the host collate path. Resume symmetry for "
        "--device_store: a run whose config.json saved device_store=true "
        "can resume on a smaller-HBM host without abusing "
        "PN2_DEVICE_STORE_BUDGET_GB to trigger the fallback",
    )
    p.add_argument(
        "--fused_steps", type=int, default=8,
        help="dispatch K optimizer steps as one fused lax.scan program "
        "(exact same math; amortizes per-step dispatch latency). 1 disables; "
        "ignored by --use_wholescene (grad accumulation drives its loop)",
    )
    p.add_argument("--data_dir", type=str, default="data/preprocessed_scenes")
    p.add_argument("--multiview_h5", type=str, default="data/enet_feats.hdf5")
    p.add_argument("--train_list", type=str, default="data/scannetv2_train.txt")
    p.add_argument("--val_list", type=str, default="data/scannetv2_val.txt")
    p.add_argument("--output_root", type=str, default="outputs")
    p.add_argument("--synthetic", action="store_true", help="use generated scenes")
    p.add_argument("--synthetic_scenes", type=int, default=8)
    p.add_argument(
        "--resume", type=str, default=None,
        help="run output dir to resume from (restores full train state); "
        "multi-host runs must pass the COORDINATOR's output dir on every "
        "process (shared filesystem)",
    )
    # multi-host (pod-scale) data parallelism: launch one process per host
    # with the same coordinator address and a unique --dist_pid; the dp mesh
    # then spans every host's chips and each process feeds its own scene
    # shard (parallel/distributed.py; exercised with real processes over the
    # CPU backend in tests/test_multihost.py)
    p.add_argument(
        "--dist_coordinator", type=str, default=None,
        help="host:port of process 0 for multi-host runs",
    )
    p.add_argument(
        "--dist_nprocs", type=int, default=1,
        help="total number of processes in the multi-host run",
    )
    p.add_argument(
        "--dist_pid", type=int, default=0,
        help="this process's id in [0, dist_nprocs)",
    )
    p.add_argument(
        "--dist_auto", action="store_true",
        help="discover coordinator/count/id from the runtime (TPU pod "
        "metadata, SLURM) instead of the explicit --dist_* flags",
    )
    return p.parse_args(argv)


if __name__ == "__main__":
    train(parse_args())
