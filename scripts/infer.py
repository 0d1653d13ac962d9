"""Inference / serving CLI.

The reference has no inference entrypoint for unlabeled scenes — its eval
and visualize scripts (reference scripts/eval.py:174-221,
scripts/visualize.py:75-140) both require ground-truth labels in the scene
files. This CLI closes that gap and carries the TPU serving path:

  # export a self-contained AOT artifact (StableHLO, params baked in) —
  # works for all three model families (semseg / cls / partseg run dirs)
  python scripts/infer.py --folder runs/X --export model.jexp [--platforms tpu]

  # run scene inference — from the run dir (exports in-process) or from a
  # previously exported artifact (no model code touched at all)
  python scripts/infer.py --folder runs/X --data_dir D --scene_list L
  python scripts/infer.py --folder runs/X --from_artifact model.jexp --synthetic

Scene .npy files may be the preprocessed (N, 11) layout or a shorter
unlabeled prefix of it — e.g. (N, 9) [xyz rgb normal] or (N, 10) — and the
missing trailing columns are zero-padded on (labels are never read, the
columns only satisfy the shared tiling layout); a cloud missing feature
columns the run's config reads is rejected with a layout message. Per scene it writes
<out>/<sid>_pred.npy with (M, 4) [x y z label] rows over the deduplicated
evaluated points (the same representative-point convention as eval), plus
an optional palette PLY with --write_ply.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _load_store(args, cfg):
    from pointnet2_scannet_tpu.data.scene_store import SceneStore
    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store

    if args.synthetic:
        return make_synthetic_store(args.synthetic_scenes, seed=1000)
    list_path = pathlib.Path(args.scene_list or cfg.paths.val_list)
    scene_ids = [l.strip() for l in list_path.read_text().splitlines() if l.strip()]
    store = SceneStore.from_npy_dir(
        scene_ids,
        args.data_dir or cfg.paths.preprocessed_dir,
        multiview_h5=(args.multiview_h5 or cfg.paths.multiview_h5)
        if cfg.data.use_multiview
        else None,
        is_weighting=False,
    )
    # Unlabeled clouds may stop after the feature columns the run actually
    # uses — pad missing trailing columns (normals/instance/label are zeros)
    # up to the shared (N, 11) tiling layout, but fail loudly if the columns
    # the run's feature config reads are absent.
    required = 9 if cfg.data.use_normal else (6 if cfg.data.use_color else 3)
    for sid, arr in store.scenes.items():
        if arr.ndim != 2 or arr.shape[1] < required:
            raise SystemExit(
                f"{sid}.npy has shape {arr.shape}; this run reads the first "
                f"{required} columns of the [xyz rgb normal instance label] "
                "layout (N, 11) — re-export the scene with those columns"
            )
        if arr.shape[1] < 11:
            pad = np.zeros((len(arr), 11 - arr.shape[1]), arr.dtype)
            store.scenes[sid] = np.concatenate([arr, pad], axis=1)
    return store


def infer(args) -> None:
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pointnet2_scannet_tpu.config import PALETTE, RunConfig
    from pointnet2_scannet_tpu.engine.export import (
        ServingPredictor,
        export_run,
        save_exported,
    )

    run_dir = pathlib.Path(args.folder)
    batch_size = args.batch_size if args.batch_size is not None else 32

    if args.export:
        exported = export_run(
            run_dir,
            checkpoint=args.checkpoint,
            batch_size=batch_size,
            npoints=args.npoints,
            emit=args.emit,
            platforms=args.platforms,
        )
        path = save_exported(exported, args.export)
        aval = exported.in_avals[0]
        print(
            f"exported {args.checkpoint} -> {path} "
            f"({path.stat().st_size / 1e6:.1f} MB, input {tuple(aval.shape)}, "
            f"emit={args.emit}, platforms={list(exported.platforms)})"
        )
        return

    import json

    from pointnet2_scannet_tpu.engine.export import run_kind

    kind = run_kind(json.loads((run_dir / "config.json").read_text()))
    if kind != "semseg":
        raise SystemExit(
            f"--folder points at a {kind} run: scene inference is a semantic-"
            "segmentation flow. Shape-family runs export serving artifacts "
            "with --export (all three families) and evaluate with "
            "scripts/eval_shapes.py; serve artifacts programmatically via "
            "engine.export.ServingPredictor."
        )
    cfg = RunConfig.load(run_dir / "config.json")
    devices = None
    if args.num_devices and args.num_devices > 1:
        import jax

        devices = jax.devices()[: args.num_devices]
        if len(devices) < args.num_devices:
            raise SystemExit(
                f"--num_devices {args.num_devices} but only "
                f"{len(devices)} devices are visible"
            )
    if args.from_artifact:
        if args.batch_size is not None or args.npoints is not None or args.emit != "labels":
            print(
                "note: --batch_size/--npoints/--emit are baked into the "
                "artifact at export time; the values saved in "
                f"{args.from_artifact} are used"
            )
        predictor = ServingPredictor.from_artifact(args.from_artifact, devices=devices)
    else:
        predictor = ServingPredictor(
            export_run(
                run_dir,
                checkpoint=args.checkpoint,
                batch_size=batch_size,
                npoints=args.npoints,
                emit=args.emit,
            ),
            devices=devices,
        )
    if predictor.channels != 3 + cfg.data.input_channels:
        raise SystemExit(
            f"artifact expects {predictor.channels} channels but the run's "
            f"feature layout is {3 + cfg.data.input_channels} "
            "(check use_color/use_normal/use_multiview)"
        )

    from pointnet2_scannet_tpu.data import WholeSceneDataset
    from pointnet2_scannet_tpu.engine.metrics import filter_points

    store = _load_store(args, cfg)
    data_cfg = cfg.data
    if predictor.npoints != data_cfg.npoints:
        import dataclasses

        data_cfg = dataclasses.replace(data_cfg, npoints=predictor.npoints)
    dataset = WholeSceneDataset(store, data_cfg, seed=0)

    out_dir = pathlib.Path(args.out or (run_dir / "infer"))
    out_dir.mkdir(parents=True, exist_ok=True)
    palette = np.asarray(PALETTE, np.uint8)
    for scene_id, (feats, labels, weights) in dataset.iter_scenes():
        preds = predictor.predict(feats)
        if preds.ndim == 3:  # logits artifact: reduce to labels here
            preds = np.argmax(preds, axis=-1)
        coords = feats[..., :3].reshape(-1, 3)
        flat = preds.reshape(-1).astype(np.int32)
        coords_u, preds_u, _, _ = filter_points(
            coords, flat, labels.reshape(-1), weights.reshape(-1)
        )
        np.save(
            out_dir / f"{scene_id}_pred.npy",
            np.concatenate([coords_u, preds_u[:, None].astype(np.float32)], axis=1),
        )
        if args.write_ply:
            from pointnet2_scannet_tpu.utils.ply import write_ply_points

            colors = palette[np.clip(preds_u, 0, len(palette) - 1)]
            write_ply_points(out_dir / f"{scene_id}_pred.ply", coords_u, colors)
        print(f"{scene_id}: {len(coords_u)} points -> {out_dir / f'{scene_id}_pred.npy'}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder", type=str, required=True, help="run output dir")
    p.add_argument("--checkpoint", type=str, default="model_best")
    p.add_argument("--batch_size", type=int, default=None,
                   help="columns per compiled program invocation (default 32)")
    p.add_argument("--npoints", type=int, default=None,
                   help="column size for the exported program "
                   "(default: the run's training npoints)")
    p.add_argument("--export", type=str, default=None,
                   help="write the AOT serving artifact here and exit")
    p.add_argument("--emit", choices=("labels", "logits"), default="labels")
    p.add_argument("--platforms", nargs="+", default=None,
                   help="lowering targets for --export "
                   "(e.g. --platforms tpu, or --platforms cpu tpu)")
    p.add_argument("--from_artifact", type=str, default=None,
                   help="serve from a saved artifact instead of re-exporting")
    p.add_argument("--num_devices", type=int, default=None,
                   help="round-robin serving batches across this many devices "
                   "(batch-parallel, no mesh; default 1)")
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--scene_list", type=str, default=None)
    p.add_argument("--multiview_h5", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic_scenes", type=int, default=1)
    p.add_argument("--out", type=str, default=None,
                   help="prediction output dir (default <folder>/infer)")
    p.add_argument("--write_ply", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    infer(parse_args())
