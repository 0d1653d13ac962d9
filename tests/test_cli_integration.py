"""End-to-end CLI integration on RAW ScanNet-format fixtures.

Builds two tiny scenes in the reference's on-disk formats — `_vh_clean_2.ply`
mesh + `.segs.json` + `.aggregation.json` (collect_scannet_scenes.py:17-76),
the label TSV (scannet_util.py:7-26), and a `frames_square` export (color
jpg / 16-bit depth png / pose txt, compute_multiview_features.py:28-88) —
then drives the five CLIs as real subprocesses:

    preprocess -> multiview -> train -> eval -> visualize

This is the only test that exercises the disk-format readers end to end
(everything else drives the library functions with arrays). Subprocesses are
forced onto the CPU backend via a -c bootstrap (the ambient env pins the
TPU plugin; JAX_PLATFORMS is ignored — see tests/conftest.py).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
ENET_PTH = pathlib.Path("/root/reference/data/scannetv2_enet.pth")


def run_cli(script: str, args: list[str], timeout: int = 900) -> str:
    """Run a CLI script in a CPU-forced subprocess; returns stdout."""
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = [{str(script)!r}] + {args!r}; "
        f"runpy.run_path({str(REPO / script)!r}, run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", boot],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"{script} {args} failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    return proc.stdout


# ---------------------------------------------------------------------------
# raw-format fixture builders
# ---------------------------------------------------------------------------


def write_mesh_ply(path: pathlib.Path, verts: np.ndarray, rgb: np.ndarray,
                   faces: np.ndarray) -> None:
    """ascii PLY in the ScanNet `_vh_clean_2.ply` schema (xyz + rgb + faces)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        for p in ("x", "y", "z"):
            f.write(f"property float {p}\n")
        for c in ("red", "green", "blue"):
            f.write(f"property uchar {c}\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v, c in zip(verts, rgb):
            f.write(f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f} {c[0]} {c[1]} {c[2]}\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def make_raw_scene(scans_dir: pathlib.Path, frames_dir: pathlib.Path,
                   scene_id: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    sdir = scans_dir / scene_id
    sdir.mkdir(parents=True)

    # a 20x20 height-field grid over 2m x 2m: enough points for columns and
    # chunks, fully labeled so chunk validity (label>0 quirk) can pass
    g = 20
    xs, ys = np.meshgrid(np.linspace(0, 2.0, g), np.linspace(0, 2.0, g))
    zs = 0.3 + 0.2 * np.sin(xs * 3) * np.cos(ys * 2) + rng.normal(0, 0.01, xs.shape)
    verts = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.float32)
    rgb = rng.integers(0, 255, (len(verts), 3)).astype(np.uint8)
    faces = []
    for i in range(g - 1):
        for j in range(g - 1):
            a, b, c, d = i * g + j, i * g + j + 1, (i + 1) * g + j, (i + 1) * g + j + 1
            faces.append((a, b, c))
            faces.append((b, d, c))
    write_mesh_ply(
        sdir / f"{scene_id}_vh_clean_2.ply", verts, rgb, np.asarray(faces)
    )

    # 4 spatial segments; instances map them to floor/chair/table + one
    # unknown label exercising the ->otherprop fallback
    seg_ids = (
        (verts[:, 0] > 1.0).astype(int) * 2 + (verts[:, 1] > 1.0).astype(int)
    )
    (sdir / f"{scene_id}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_ids.tolist()})
    )
    agg = {
        "segGroups": [
            {"label": "floor", "segments": [0]},
            {"label": "chair", "segments": [1]},
            {"label": "table", "segments": [2]},
            {"label": "fancygadget9000", "segments": [3]},  # unmapped
        ]
    }
    (sdir / f"{scene_id}.aggregation.json").write_text(json.dumps(agg))

    # frames_square export: 2 frames of color jpg / 16-bit depth png / pose
    import imageio.v2 as imageio

    fdir = frames_dir / scene_id
    for sub in ("color", "depth", "pose"):
        (fdir / sub).mkdir(parents=True)
    for fid in ("0", "20"):
        color = rng.integers(0, 255, (256, 328, 3)).astype(np.uint8)
        imageio.imwrite(fdir / "color" / f"{fid}.jpg", color)
        depth = np.full((32, 41), 1750, np.uint16)  # 1.75 m everywhere
        imageio.imwrite(fdir / "depth" / f"{fid}.png", depth)
        # camera-to-world: identity rotation, camera 1.5 m below the scene
        # looking along +z -> point depths ~1.5-2.0 m, partially matching the
        # constant depth map (the 0.05 m consistency window)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [1.0, 1.0, -1.5]
        np.savetxt(fdir / "pose" / f"{fid}.txt", pose)


def write_label_tsv(path: pathlib.Path) -> None:
    rows = [
        ("floor", "floor"),
        ("chair", "chair"),
        ("table", "table"),
        ("fancygadget9000", "weirdthing"),  # nyu40class not in NYU-20 -> otherprop
    ]
    with open(path, "w") as f:
        f.write("id\traw_category\tnyu40class\n")
        for i, (raw, nyu) in enumerate(rows):
            f.write(f"{i}\t{raw}\t{nyu}\n")


@pytest.mark.slow
def test_cli_pipeline_on_reference_format_fixtures(tmp_path):
    if not ENET_PTH.exists():
        pytest.skip("reference ENet weights not available")
    scans = tmp_path / "scans"
    frames = tmp_path / "frames_square"
    scene_ids = ["scene9000_00", "scene9001_00"]
    for k, sid in enumerate(scene_ids):
        make_raw_scene(scans, frames, sid, seed=10 + k)
    tsv = tmp_path / "labels.combined.tsv"
    write_label_tsv(tsv)
    all_list = tmp_path / "all.txt"
    all_list.write_text("\n".join(scene_ids) + "\n")
    val_list = tmp_path / "val.txt"
    val_list.write_text(scene_ids[1] + "\n")
    preproc = tmp_path / "preprocessed"

    # -- stage 1: preprocess raw scans -> (N, 11) npy ------------------------
    out = run_cli(
        "scripts/preprocess.py",
        ["--scans_dir", str(scans), "--label_tsv", str(tsv),
         "--output_dir", str(preproc)],
    )
    assert f"preprocessed {len(scene_ids)}/{len(scene_ids)}" in out
    for sid in scene_ids:
        arr = np.load(preproc / f"{sid}.npy")
        assert arr.shape[1] == 11
        labels = arr[:, 10]
        assert labels.min() >= 0 and labels.max() < 20
        from pointnet2_scannet_tpu.config import NYU_CLASSES

        assert NYU_CLASSES.index("otherprop") in set(labels.astype(int))
        norms = np.linalg.norm(arr[:, 6:9], axis=1)
        assert (norms > 0.5).mean() > 0.9  # face-derived vertex normals

    # GT visual check artifact (preprocessing/visualize_prep_scene.py analog)
    run_cli(
        "scripts/preprocess.py",
        ["--output_dir", str(preproc), "--visualize", scene_ids[0]],
    )
    assert (preproc / f"{scene_ids[0]}_gt.ply").exists()

    # -- stage 2: multiview features from the frames_square export ----------
    h5 = tmp_path / "enet_feats.hdf5"
    out = run_cli(
        "scripts/multiview.py",
        ["--frames_root", str(frames), "--data_dir", str(preproc),
         "--scene_list", str(all_list), "--enet_path", str(ENET_PTH),
         "--output", str(h5), "--batch_size", "2"],
    )
    import h5py

    with h5py.File(h5) as f:
        for sid in scene_ids:
            n = len(np.load(preproc / f"{sid}.npy"))
            assert f[sid].shape == (n, 128)

    # -- stage 3: train on the preprocessed scenes (with multiview) ---------
    runs = tmp_path / "runs"
    out = run_cli(
        "scripts/train.py",
        ["--data_dir", str(preproc), "--train_list", str(all_list),
         "--val_list", str(val_list), "--multiview_h5", str(h5),
         "--use_color", "--use_normal", "--use_multiview",
         "--epoch", "2", "--batch_size", "2", "--npoints", "512",
         "--verbose", "1", "--tag", "ITEST", "--output_root", str(runs)],
    )
    run_dirs = list(runs.glob("*_ITEST"))
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    for artifact in ("config.json", "info.json", "model_best.msgpack",
                     "model_last.msgpack", "best.txt"):
        assert (run_dir / artifact).exists(), artifact
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["data"]["use_multiview"] is True

    # -- stage 4: whole-scene eval from the run dir's saved config ----------
    out = run_cli("scripts/eval.py", ["--folder", str(run_dir), "--batch_size", "2"])
    for line in ("Point accuracy:", "Voxel mIoU:", "Calibrated voxel accuracy:"):
        assert line in out
    assert "floor" in out  # per-class table

    # -- stage 5: visualization PLY ------------------------------------------
    run_cli("scripts/visualize.py", ["--folder", str(run_dir), "--batch_size", "2"])
    preds = list((run_dir / "preds").glob("*.ply"))
    assert preds, "no prediction PLYs written"
    from pointnet2_scannet_tpu.utils.ply import read_ply

    ply = read_ply(preds[0])
    assert len(ply["vertex"]) > 0

    # -- stage 6: export the trained checkpoint in the reference's format ----
    out = run_cli("scripts/export_torch.py", ["--folder", str(run_dir)])
    assert "reference-format state_dict" in out
    import torch

    sd = torch.load(run_dir / "model_best.pth", weights_only=False)
    assert any(k.startswith("SA_modules.0") for k in sd)
    assert "cls_layer.2.conv.weight" in sd
