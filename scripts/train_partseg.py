"""Part-segmentation training CLI (beyond-reference model family).

Trains PointNet2PartSeg (models/pointnet2_partseg.py) on the synthetic
parametric shape dataset with per-point part labels (data/shapes.py,
ShapeNet-part-style global part-id blocks per category). Reuses the exact
segmentation engine — train_step/eval_step with (B, N) labels/weights and
the on-device confusion matrix — including the explicit shard_map dp step
on multi-device meshes (model built with bn_axis_name; parallel/step.py).

Writes <output_root>/<stamp>_<TAG>/ with config.json, info.json,
model_best.msgpack (gated on val part mIoU), model_last.msgpack, and
all_scalars.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def train(args) -> None:
    # multi-host: join the process group before anything touches devices;
    # the dp mesh then spans every host (same pattern as scripts/train.py)
    from pointnet2_scannet_tpu.parallel.distributed import initialize_distributed

    ctx = initialize_distributed(
        args.dist_coordinator, args.dist_nprocs, args.dist_pid,
        auto=args.dist_auto,
    )
    if ctx.num_processes > 1:
        if args.num_devices is not None:
            raise SystemExit(
                "--num_devices cannot be combined with multi-host flags "
                "(the mesh must span every process's devices)"
            )
        if args.batch_size % ctx.num_processes:
            raise SystemExit(
                f"--batch_size {args.batch_size} not divisible by "
                f"{ctx.num_processes} processes"
            )
    say = print if ctx.is_coordinator else (lambda *a, **k: None)

    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.data.shapes import (
        SHAPE_CLASSES,
        num_parts_total,
        part_offsets,
        part_sizes,
        sample_partseg_batch,
    )
    from pointnet2_scannet_tpu.engine.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from pointnet2_scannet_tpu.engine.metrics import (
        confusion_to_point_metrics,
        instance_part_miou,
    )
    from pointnet2_scannet_tpu.engine.train_state import (
        create_train_state,
        make_lr_schedule,
        make_optimizer,
    )
    from pointnet2_scannet_tpu.models import get_partseg_model
    from pointnet2_scannet_tpu.parallel.mesh import make_mesh
    from pointnet2_scannet_tpu.parallel.step import (
        make_shardmap_eval_step,
        make_shardmap_train_step,
    )

    resume_dir = pathlib.Path(args.resume) if args.resume else None
    if resume_dir is not None:
        # model/data/optimizer flags come from the run's saved config (same
        # no-retyped-flags rule as scripts/train.py --resume); EXECUTION
        # flags (--num_devices, --verbose) may be overridden at the resume
        # CLI (e.g. resuming a dp=8 run on a 1-chip host), and --epoch may
        # EXTEND the run. Fail before mutating anything if the run has no
        # restorable checkpoint.
        if not (resume_dir / "model_last.msgpack").exists():
            raise FileNotFoundError(resume_dir / "model_last.msgpack")
        saved = json.loads((resume_dir / "config.json").read_text())
        epoch_target = (
            int(saved["epoch"]) if args.epoch is None
            else max(args.epoch, int(saved["epoch"]))
        )
        overrides = {
            k: v
            for k, v in (("num_devices", args.num_devices), ("verbose", args.verbose))
            if v is not None
        }
        args = argparse.Namespace(
            **{
                k: v for k, v in saved.items()
                if k not in ("shape_classes", "num_parts")
            }
        )
        args.resume, args.epoch = str(resume_dir), epoch_target
        vars(args).update(overrides)
    if args.epoch is None:
        args.epoch = 20
    if ctx.num_processes > 1:
        # multi-host meshes must span every global device — this also
        # overrides a RESUMED config's saved single-host num_devices (a
        # host-0-only mesh would leave other processes outside the
        # collectives and hang)
        args.num_devices = None
    elif args.num_devices is None:
        args.num_devices = 1
    if args.verbose is None:
        args.verbose = 0

    num_categories = args.categories
    num_parts = num_parts_total(num_categories)
    mesh = make_mesh(args.num_devices, batch_size=args.batch_size)
    ctx.validate_mesh(mesh)  # span + process-contiguity (no-op single-process)
    bn_axis = mesh.axis_names[0] if mesh.size > 1 else None
    model = get_partseg_model(
        num_parts,
        num_categories,
        is_msg=args.use_msg,
        bn=not args.no_bn,
        dtype=jnp.bfloat16 if args.bf16 else None,
        bn_axis_name=bn_axis,
    )

    schedule = make_lr_schedule(args.lr, args.ds, args.df, args.train_batches)
    tx = make_optimizer(schedule, args.wd)
    sample = jnp.zeros(
        (args.batch_size, args.npoints, 3 + num_categories), jnp.float32
    )
    state = create_train_state(model, jax.random.key(args.seed), sample, tx)

    if ctx.num_processes > 1:
        state = ctx.replicate(state, mesh)

    train_step = make_shardmap_train_step(mesh, num_classes=num_parts)
    eval_step = make_shardmap_eval_step(mesh, num_classes=num_parts)
    strategy = f"shard_map dp={mesh.size}" if mesh.size > 1 else "single-device"
    if ctx.num_processes > 1:
        strategy += f" x {ctx.num_processes} processes"
    # per-process rows of the global batch: train streams are disjoint per
    # process (seed folds the pid); the fixed val set stays GLOBAL — every
    # process builds the same batches and feeds its row-slice
    local_b = args.batch_size // ctx.num_processes
    place_train = (
        (lambda b: ctx.place(b, mesh)) if ctx.num_processes > 1 else (lambda b: b)
    )
    place_val = (
        (lambda b: ctx.place_from_global(b, mesh))
        if ctx.num_processes > 1
        else (lambda b: b)
    )

    if resume_dir is not None:
        output_dir = resume_dir  # continue in place
    else:
        stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
        if args.tag:
            stamp += "_" + args.tag.upper()
        output_dir = pathlib.Path(args.output_root) / stamp
        if ctx.is_coordinator:
            output_dir.mkdir(parents=True, exist_ok=True)
    config_json = json.dumps(
        {
            **vars(args),
            "shape_classes": SHAPE_CLASSES[:num_categories],
            "num_parts": num_parts,
        },
        indent=2,
        default=str,
    )
    if ctx.is_coordinator:
        (output_dir / "config.json").write_text(config_json)
        info = {
            "parallel": strategy,
            "num_params": int(
                sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(state.params))
            ),
        }
        (output_dir / "info.json").write_text(json.dumps(info, indent=2))
    say(f"parallel strategy: {strategy}; training -> {output_dir}")

    rng = np.random.default_rng(
        [args.seed, ctx.process_id] if ctx.num_processes > 1 else args.seed
    )
    val_rng = np.random.default_rng(args.seed + 10_000)
    val_batches = [
        sample_partseg_batch(
            val_rng, args.batch_size, args.npoints, num_categories, augment=False
        )
        for _ in range(args.val_batches)
    ]
    dropout_key = jax.random.key(args.seed + 1)
    if ctx.num_processes > 1:
        dropout_key = ctx.replicate(dropout_key, mesh)

    offsets = part_offsets(num_categories)
    sizes = part_sizes(num_categories)
    scalars: list[dict] = []
    best_miou, start_epoch = -1.0, 0
    if resume_dir is not None:
        state, meta = restore_checkpoint(output_dir, "model_last", state)
        start_epoch = int(meta.get("epoch", -1)) + 1
        scal_path = output_dir / "all_scalars.json"
        if scal_path.exists():
            scalars = json.loads(scal_path.read_text())[:start_epoch]
        best_meta = output_dir / "model_best.meta.json"
        if best_meta.exists():
            best_miou = float(
                json.loads(best_meta.read_text())
                .get("best", {})
                .get("val_part_miou", -1.0)
            )
        if ctx.num_processes > 1:
            state = ctx.replicate(state, mesh)
        # fresh-but-deterministic train stream: don't replay the run's first
        # epochs' batches (the val set above stays the run's original one)
        rng = np.random.default_rng(
            [args.seed, start_epoch, ctx.process_id]
            if ctx.num_processes > 1
            else [args.seed, start_epoch]
        )
        say(
            f"resumed at epoch {start_epoch} (step {int(state.step)}, "
            f"best val part mIoU {best_miou:.4f}); training to epoch {args.epoch}"
        )
    t0 = time.time()
    for epoch in range(start_epoch, args.epoch):
        losses = []
        for it in range(args.train_batches):
            batch = place_train(
                sample_partseg_batch(rng, local_b, args.npoints, num_categories)
            )
            state, stats = train_step(state, batch, dropout_key)
            losses.append(float(stats["loss"]))
            if args.verbose and (it + 1) % args.verbose == 0:
                say(
                    f"epoch {epoch + 1} iter {it + 1}/{args.train_batches} "
                    f"loss {losses[-1]:.4f}"
                )
        cm = np.zeros((num_parts, num_parts), np.int64)
        cat_ious: dict[int, list[float]] = {}
        for batch in val_batches:
            out = eval_step(state, place_val(batch))
            cm += np.asarray(out["confusion"], np.int64)
            # instance mIoU is a host metric over EVERY shape of the global
            # val batch; preds come back dp-sharded, so gather the full rows
            _, per_cat = instance_part_miou(
                ctx.all_rows(out["preds"]), batch["labels"], batch["category"],
                offsets, sizes,
            )
            for c, v in per_cat.items():
                cat_ious.setdefault(c, []).extend(v)
        m = confusion_to_point_metrics(cm)
        # instance-average (mean over ALL shapes, per-shape weighting) and
        # category-average (mean over categories of their shapes' means)
        # mIoU — the ShapeNet-part metric pair
        all_ious = [x for v in cat_ious.values() for x in v]
        ins_miou = float(np.mean(all_ious)) if all_ious else 0.0
        cat_miou = (
            float(np.mean([np.mean(v) for v in cat_ious.values()]))
            if cat_ious else 0.0
        )
        scalars.append(
            {
                "epoch": epoch + 1,
                "train_loss": float(np.mean(losses)),
                "val_acc": m["point_acc"],
                "val_part_miou": m["point_miou"],
                "val_ins_miou": ins_miou,
                "val_cat_miou": cat_miou,
            }
        )
        say(
            f"epoch {epoch + 1}/{args.epoch}: train loss {np.mean(losses):.4f}, "
            f"val acc {m['point_acc']:.4f}, part mIoU {m['point_miou']:.4f}, "
            f"ins mIoU {ins_miou:.4f}, cat mIoU {cat_miou:.4f} "
            f"({time.time() - t0:.1f}s)"
        )
        if ctx.is_coordinator:
            save_checkpoint(
                output_dir, "model_last", state, epoch=epoch, config_json=config_json
            )
            # written alongside model_last every epoch so a crash-resumed run
            # keeps its full training history
            (output_dir / "all_scalars.json").write_text(json.dumps(scalars, indent=2))
        if m["point_miou"] > best_miou:
            best_miou = m["point_miou"]
            if ctx.is_coordinator:
                save_checkpoint(
                    output_dir,
                    "model_best",
                    state,
                    epoch=epoch,
                    best={"val_part_miou": m["point_miou"]},
                    config_json=config_json,
                )
    ctx.barrier("train-partseg-end")
    say(f"best val part mIoU: {best_miou:.4f}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tag", type=str, default="")
    p.add_argument(
        "--categories", type=int, default=8,
        help="number of shape categories (first K of data/shapes.SHAPE_CLASSES;"
        " the part-label space is their global part-id union)",
    )
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument(
        "--epoch", type=int, default=None,
        help="total epochs (default 20; on --resume defaults to the run's "
        "saved target, pass a larger value to extend)",
    )
    p.add_argument("--train_batches", type=int, default=50, help="batches per epoch")
    p.add_argument("--val_batches", type=int, default=8)
    p.add_argument("--npoints", type=int, default=1024)
    p.add_argument(
        "--verbose", type=int, default=None,
        help="iters between reports (default 0; on --resume defaults to the "
        "run's saved value)",
    )
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--ds", type=int, default=10, help="lr decay step (epochs)")
    p.add_argument("--df", type=float, default=0.7)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_msg", action="store_true")
    p.add_argument("--no_bn", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument(
        "--num_devices", type=int, default=None,
        help="dp mesh size (default 1; on --resume defaults to the run's "
        "saved value — override to resume on different hardware)",
    )
    p.add_argument("--output_root", type=str, default="outputs_partseg")
    p.add_argument(
        "--resume", type=str, default=None,
        help="run dir to continue in place (flags rehydrated from its "
        "config.json; --epoch may extend the run)",
    )
    # multi-host (same semantics as scripts/train.py): per-process train
    # batch shards, global fixed val set, coordinator-gated writes
    p.add_argument("--dist_coordinator", type=str, default=None)
    p.add_argument("--dist_nprocs", type=int, default=1)
    p.add_argument("--dist_pid", type=int, default=0)
    p.add_argument("--dist_auto", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    train(parse_args())
