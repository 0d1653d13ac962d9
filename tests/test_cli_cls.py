"""Classification CLI end-to-end, on the 8-virtual-device CPU mesh.

One subprocess run of scripts/train_cls.py with --num_devices 8 proves, at
the CLI level (not just the step level): the cls model family trains through
the explicit shard_map dp step (model built with bn_axis_name, per-device
Pallas-capable tracing — parallel/step.py make_shardmap_train_step), the
loss actually decreases on the synthetic shape dataset, and the run
directory artifacts (config/info/scalars/checkpoints) appear.
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
def test_train_cls_dp8(tmp_path):
    args = [
        "--classes", "3",
        "--batch_size", "16",
        "--npoints", "512",
        "--epoch", "2",
        "--train_batches", "8",
        "--val_batches", "2",
        "--num_devices", "8",
        "--tag", "CLSTEST",
        "--output_root", str(tmp_path),
    ]
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"import runpy, sys; sys.argv = ['scripts/train_cls.py'] + {args!r}; "
        f"runpy.run_path({str(REPO / 'scripts/train_cls.py')!r}, "
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
        f"train_cls failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    assert "shard_map dp=8" in proc.stdout

    (run_dir,) = [p for p in tmp_path.iterdir() if p.name.endswith("_CLSTEST")]
    for name in (
        "config.json",
        "info.json",
        "all_scalars.json",
        "model_best.msgpack",
        "model_last.msgpack",
    ):
        assert (run_dir / name).exists(), name
    info = json.loads((run_dir / "info.json").read_text())
    assert info["parallel"] == "shard_map dp=8"
    scalars = json.loads((run_dir / "all_scalars.json").read_text())
    assert len(scalars) == 2
    assert scalars[1]["train_loss"] < scalars[0]["train_loss"], scalars
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["shape_classes"] == ["sphere", "cube", "cylinder"]

    # chain: standalone evaluator on the trained run (config rehydration,
    # checkpoint restore, per-class report) — single device, fresh batches
    boot = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "import runpy, sys; sys.argv = ['scripts/eval_shapes.py', "
        f"'--folder', {str(run_dir)!r}, '--batches', '2']; "
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
    assert "evaluating cls run" in proc.stdout
    assert "overall accuracy:" in proc.stdout
    assert "cylinder" in proc.stdout  # per-class table rows
