"""Part-segmentation CLI end-to-end, on the 8-virtual-device CPU mesh.

Mirror of tests/test_cli_cls.py for the partseg family: one subprocess run
of scripts/train_partseg.py with --num_devices 8 proves CLI-level training
through the explicit shard_map dp step with per-point labels, decreasing
loss, and the run-directory artifacts.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_train_partseg_dp8(tmp_path):
    args = [
        "--categories", "2",
        "--batch_size", "16",
        "--npoints", "512",
        "--epoch", "2",
        "--train_batches", "8",
        "--val_batches", "2",
        "--num_devices", "8",
        "--tag", "PARTTEST",
        "--output_root", str(tmp_path),
    ]
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = ['scripts/train_partseg.py'] + {args!r}; "
        f"runpy.run_path({str(REPO / 'scripts/train_partseg.py')!r}, "
        "run_name='__main__')"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-c", boot],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, (
        f"train_partseg failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    assert "shard_map dp=8" in proc.stdout

    (run_dir,) = [p for p in tmp_path.iterdir() if p.name.endswith("_PARTTEST")]
    for name in (
        "config.json",
        "info.json",
        "all_scalars.json",
        "model_best.msgpack",
        "model_last.msgpack",
    ):
        assert (run_dir / name).exists(), name
    scalars = json.loads((run_dir / "all_scalars.json").read_text())
    assert len(scalars) == 2
    assert scalars[1]["train_loss"] < scalars[0]["train_loss"], scalars
    assert 0.0 <= scalars[-1]["val_part_miou"] <= 1.0
    assert 0.0 <= scalars[-1]["val_ins_miou"] <= 1.0
    assert 0.0 <= scalars[-1]["val_cat_miou"] <= 1.0
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["shape_classes"] == ["sphere", "cube"]
    assert cfg["num_parts"] == 4

    # chain: standalone evaluator on the trained run with PLY dumping —
    # config rehydration picks the partseg family, instance/category mIoU
    # report prints, pred+gt part-colored PLYs land in <run>/preds/
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; sys.argv = ['scripts/eval_shapes.py', "
        f"'--folder', {str(run_dir)!r}, '--batches', '2', '--dump_ply', '1']; "
        f"runpy.run_path({str(REPO / 'scripts/eval_shapes.py')!r}, "
        "run_name='__main__')"
    )
    proc = subprocess.run(
        [sys.executable, "-c", boot],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"eval_shapes failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    assert "evaluating partseg run" in proc.stdout
    assert "instance-avg mIoU:" in proc.stdout
    plys = sorted((run_dir / "preds").glob("shape000_*_*.ply"))
    assert len(plys) == 2, plys  # pred + gt
    from pointnet2_scannet_tpu.utils.ply import read_ply

    verts = read_ply(plys[0])["vertex"]
    assert len(verts) == 512
    assert {"x", "y", "z", "red", "green", "blue"} <= set(verts.dtype.names)
