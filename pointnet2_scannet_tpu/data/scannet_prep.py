"""ScanNet raw-scan preprocessing.

Counterpart of the reference preprocessing
(preprocessing/collect_scannet_scenes.py:17-104 + scannet_util.py:7-26):
per scene, read the `_vh_clean_2.ply` mesh, the over-segmentation JSON, and
the aggregation JSON; map raw instance labels to the 20 NYU classes via the
scannetv2-labels.combined.tsv table (unknown -> 'otherprop'); compute vertex
normals from the mesh faces; emit an (N, 11) float array
[xyz, rgb(0-255), normal, instance_label, semantic_label] randomly
subsampled to at most `max_points` (reference NUM_MAX_PTS = 100_000).

The TSV ships with ScanNet and is parsed at runtime (column 'raw_category'
-> column 'nyu40class'); it is not vendored here.
"""

from __future__ import annotations

import json
import pathlib

import numpy as np

from pointnet2_scannet_tpu.config import NYU_CLASSES

MAX_POINTS = 100_000


def load_label_map(tsv_path: str | pathlib.Path) -> dict[str, str]:
    """raw_category -> NYU-20 class name ('otherprop' when unmapped)."""
    valid = set(NYU_CLASSES)
    mapping: dict[str, str] = {}
    with open(tsv_path) as f:
        header = f.readline().rstrip("\n").split("\t")
        try:
            raw_col = header.index("raw_category")
            nyu_col = header.index("nyu40class")
        except ValueError:
            # headerless fallback: the reference hardcodes columns 1 and 7
            raw_col, nyu_col = 1, 7
            f.seek(0)
            f.readline()
        for line in f:
            cells = line.rstrip("\n").split("\t")
            if len(cells) <= max(raw_col, nyu_col):
                continue
            raw, nyu = cells[raw_col], cells[nyu_col]
            mapping[raw] = nyu if nyu in valid else "otherprop"
    return mapping


def collect_scene(
    scan_dir: str | pathlib.Path,
    scene_id: str,
    label_map: dict[str, str],
    *,
    max_points: int = MAX_POINTS,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Assemble one scene's (N, 11) labeled point array."""
    from pointnet2_scannet_tpu.utils.ply import read_mesh_vertices_rgb_normal

    rng = rng or np.random.default_rng(0)
    scan_dir = pathlib.Path(scan_dir) / scene_id
    mesh = read_mesh_vertices_rgb_normal(scan_dir / f"{scene_id}_vh_clean_2.ply")

    segs = json.loads(
        (scan_dir / f"{scene_id}_vh_clean_2.0.010000.segs.json").read_text()
    )
    seg_ids = np.asarray(segs["segIndices"], np.int64)  # per-vertex segment id

    agg = json.loads((scan_dir / f"{scene_id}.aggregation.json").read_text())

    rows = []
    for inst_idx, group in enumerate(agg["segGroups"]):
        name = label_map.get(group["label"], "otherprop")
        sem = NYU_CLASSES.index(name)
        vert_mask = np.isin(seg_ids, np.asarray(group["segments"], np.int64))
        pts = mesh[vert_mask]
        if len(pts) == 0:
            continue
        inst = np.full((len(pts), 1), float(inst_idx), np.float32)
        lab = np.full((len(pts), 1), float(sem), np.float32)
        rows.append(np.concatenate([pts, inst, lab], axis=1))

    if not rows:
        raise ValueError(f"scene {scene_id} has no labeled instances")
    data = np.concatenate(rows, axis=0)
    if len(data) > max_points:
        choice = rng.choice(len(data), max_points, replace=False)
        data = data[choice]
    return data.astype(np.float32)


def collect_scenes(
    scans_dir: str | pathlib.Path,
    scene_ids: list[str],
    tsv_path: str | pathlib.Path,
    output_dir: str | pathlib.Path,
    *,
    skip_errors: bool = True,
) -> list[str]:
    """Batch preprocess; per-scene failures are logged and skipped, like the
    reference's try/except-continue (collect_scannet_scenes.py:101-102)."""
    label_map = load_label_map(tsv_path)
    out = pathlib.Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    done = []
    for sid in scene_ids:
        try:
            data = collect_scene(scans_dir, sid, label_map)
            np.save(out / f"{sid}.npy", data)
            done.append(sid)
        except Exception as e:  # noqa: BLE001
            if not skip_errors:
                raise
            print(f"ERROR processing {sid}: {e}")
    return done
