"""Evaluate a shape-classification or part-segmentation run (beyond-reference
model families).

Mirrors scripts/eval.py's design for the synthetic shape families: all model
and data flags are REHYDRATED from the run directory's config.json (written
by scripts/train_cls.py / scripts/train_partseg.py) — never retyped — so a
checkpoint can't silently be evaluated under the wrong architecture. The run
kind (cls vs partseg) is detected from the config itself.

Reports:
  cls      — overall accuracy + per-class accuracy table from the on-device
             confusion matrix.
  partseg  — point accuracy, confusion part mIoU, and the ShapeNet-part
             instance-/category-average mIoU pair, + a per-category table;
             --dump_ply N writes the first N validation clouds as ascii PLYs
             (pred- and gt-part-colored side by side) to <run>/preds/.

The fresh validation stream is drawn at a seed offset disjoint from the
trainer's (seed + 20_000 vs its + 10_000) so this never re-scores the
early-stopping set.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def evaluate(args) -> None:
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp
    import optax

    from pointnet2_scannet_tpu.config import PALETTE
    from pointnet2_scannet_tpu.data.shapes import (
        SHAPE_CLASSES,
        SHAPE_PARTS,
        num_parts_total,
        part_offsets,
        part_sizes,
        sample_cls_batch,
        sample_partseg_batch,
    )
    from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only
    from pointnet2_scannet_tpu.engine.metrics import (
        confusion_to_point_metrics,
        instance_part_miou,
    )
    from pointnet2_scannet_tpu.engine.train_state import TrainState
    from pointnet2_scannet_tpu.models import get_cls_model, get_partseg_model
    from pointnet2_scannet_tpu.parallel.mesh import make_mesh
    from pointnet2_scannet_tpu.parallel.step import make_shardmap_eval_step
    from pointnet2_scannet_tpu.utils.ply import write_ply_points

    folder = pathlib.Path(args.folder)
    cfg_path = folder / "config.json"
    if not cfg_path.exists():
        raise FileNotFoundError(f"{cfg_path} — is --folder a training run dir?")
    cfg = json.loads(cfg_path.read_text())
    kind = "partseg" if "num_parts" in cfg else "cls"

    batch_size = args.batch_size or int(cfg["batch_size"])
    npoints = int(cfg["npoints"])
    mesh = make_mesh(args.num_devices, batch_size=batch_size)
    bn_axis = mesh.axis_names[0] if mesh.size > 1 else None
    dtype = jnp.bfloat16 if cfg.get("bf16") else None

    if kind == "cls":
        num_out = int(cfg["classes"])
        class_names = cfg["shape_classes"]
        model = get_cls_model(
            num_out, is_msg=cfg["use_msg"], bn=not cfg["no_bn"], dtype=dtype,
            bn_axis_name=bn_axis,
        )
    else:
        num_cats = int(cfg["categories"])
        num_out = num_parts_total(num_cats)
        assert num_out == int(cfg["num_parts"]), (num_out, cfg["num_parts"])
        class_names = cfg["shape_classes"]
        model = get_partseg_model(
            num_out, num_cats, is_msg=cfg["use_msg"], bn=not cfg["no_bn"],
            dtype=dtype, bn_axis_name=bn_axis,
        )

    variables = restore_params_only(folder, args.checkpoint)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.identity(),
    )
    eval_step = make_shardmap_eval_step(mesh, num_classes=num_out)

    rng = np.random.default_rng(int(cfg["seed"]) + 20_000)
    cm = np.zeros((num_out, num_out), np.int64)
    print(
        f"evaluating {kind} run {folder.name} [{args.checkpoint}] — "
        f"{args.batches} fresh batches of {batch_size} x {npoints}"
        + (f", dp={mesh.size}" if mesh.size > 1 else "")
    )

    if kind == "cls":
        for _ in range(args.batches):
            batch = sample_cls_batch(rng, batch_size, npoints, num_out, augment=False)
            cm += np.asarray(eval_step(state, batch)["confusion"], np.int64)
        acc = float(np.trace(cm)) / max(cm.sum(), 1)
        print(f"\noverall accuracy: {acc:.4f}  ({int(np.trace(cm))}/{int(cm.sum())})")
        print(f"{'class':<14}{'acc':>8}{'count':>8}")
        for i, name in enumerate(class_names):
            n = int(cm[i].sum())
            print(f"{name:<14}{cm[i, i] / max(n, 1):>8.4f}{n:>8d}")
        return

    offsets = part_offsets(num_cats)
    sizes = part_sizes(num_cats)
    per_cat: dict[int, list[float]] = {}
    dumped = 0
    preds_dir = folder / "preds"
    for _ in range(args.batches):
        batch = sample_partseg_batch(
            rng, batch_size, npoints, num_cats, augment=False
        )
        out = eval_step(state, batch)
        cm += np.asarray(out["confusion"], np.int64)
        preds = np.asarray(out["preds"])
        _, cat_d = instance_part_miou(
            preds, batch["labels"], batch["category"], offsets, sizes
        )
        for c, v in cat_d.items():
            per_cat.setdefault(c, []).extend(v)
        # dump the first --dump_ply clouds of the eval stream, spilling
        # across batches (global shapeNNN index, per-batch row index)
        take = min(max(args.dump_ply - dumped, 0), batch_size)
        for i in range(take):
            preds_dir.mkdir(exist_ok=True)
            xyz = batch["points"][i, :, :3]
            pal = np.asarray(PALETTE, np.uint8)
            cat = class_names[int(batch["category"][i])]
            for tagname, ids in (("pred", preds[i]), ("gt", batch["labels"][i])):
                write_ply_points(
                    preds_dir / f"shape{dumped + i:03d}_{cat}_{tagname}.ply",
                    xyz,
                    pal[ids % len(pal)],
                )
        dumped += take

    m = confusion_to_point_metrics(cm)
    # instance mIoU = mean over ALL shapes (per-shape weighting); category
    # mIoU = mean over categories of their shapes' means (ShapeNet-part pair)
    all_ious = [x for v in per_cat.values() for x in v]
    ins_miou = float(np.mean(all_ious)) if all_ious else 0.0
    cat_means = {c: float(np.mean(v)) for c, v in per_cat.items()}
    cat_miou = float(np.mean(list(cat_means.values()))) if cat_means else 0.0
    print(
        f"\npoint acc: {m['point_acc']:.4f}   part mIoU (confusion): "
        f"{m['point_miou']:.4f}\ninstance-avg mIoU: {ins_miou:.4f}   "
        f"category-avg mIoU: {cat_miou:.4f}"
    )
    print(f"{'category':<14}{'mIoU':>8}{'shapes':>8}  parts")
    for c in sorted(cat_means):
        print(
            f"{class_names[c]:<14}{cat_means[c]:>8.4f}{len(per_cat[c]):>8d}  "
            f"{', '.join(SHAPE_PARTS[class_names[c]])}"
        )
    if args.dump_ply:
        print(f"wrote {2 * dumped} PLYs to {preds_dir}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--folder", type=str, required=True,
        help="run output dir from train_cls.py / train_partseg.py",
    )
    p.add_argument("--checkpoint", type=str, default="model_best")
    p.add_argument("--batches", type=int, default=16, help="fresh val batches")
    p.add_argument(
        "--batch_size", type=int, default=None,
        help="override the run's batch size (default: from config.json)",
    )
    p.add_argument(
        "--dump_ply", type=int, default=0,
        help="partseg: write this many val clouds as pred+gt part-colored PLYs",
    )
    p.add_argument("--num_devices", type=int, default=1)
    return p.parse_args(argv)


if __name__ == "__main__":
    evaluate(parse_args())
