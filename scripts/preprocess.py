"""Preprocessing CLI: raw ScanNet scans -> per-scene (N, 11) npy arrays.

Counterpart of preprocessing/collect_scannet_scenes.py:81-104. Also provides
--visualize <scene_id> to dump a GT-colored PLY sanity check of a
preprocessed scene (counterpart of preprocessing/visualize_prep_scene.py).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(args) -> None:
    from pointnet2_scannet_tpu.config import PALETTE
    from pointnet2_scannet_tpu.data.scannet_prep import collect_scenes
    from pointnet2_scannet_tpu.utils.ply import write_ply_points

    if args.visualize:
        scene = np.load(pathlib.Path(args.output_dir) / f"{args.visualize}.npy")
        palette = np.asarray(PALETTE, np.uint8)
        colors = palette[np.clip(scene[:, 10].astype(int), 0, len(palette) - 1)]
        out = pathlib.Path(args.output_dir) / f"{args.visualize}_gt.ply"
        write_ply_points(out, scene[:, :3], colors)
        print(f"wrote {out}")
        return

    scene_ids = sorted(
        p.name for p in pathlib.Path(args.scans_dir).iterdir() if p.is_dir()
    )
    if args.scene_list:
        wanted = {l.strip() for l in open(args.scene_list) if l.strip()}
        scene_ids = [s for s in scene_ids if s in wanted]
    done = collect_scenes(args.scans_dir, scene_ids, args.label_tsv, args.output_dir)
    print(f"preprocessed {len(done)}/{len(scene_ids)} scenes -> {args.output_dir}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scans_dir", type=str, default="data/scannet/scans")
    p.add_argument("--label_tsv", type=str, default="data/scannetv2-labels.combined.tsv")
    p.add_argument("--output_dir", type=str, default="data/preprocessed_scenes")
    p.add_argument("--scene_list", type=str, default=None)
    p.add_argument("--visualize", type=str, default=None, help="scene id to dump as GT PLY")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
