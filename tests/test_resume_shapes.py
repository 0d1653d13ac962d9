"""Resume support for the shape-family trainers (cls + partseg).

In-process (no subprocess) round-trips: train a tiny run, resume it in
place, and check the continue-in-place contract — flags rehydrated from
config.json, optimizer step preserved, scalars appended (not replayed),
best-metric gate carried over, and a bare --resume (no --epoch) finishes
the saved target instead of silently extending to the parser default.
"""

from __future__ import annotations

import importlib.util
import json
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(script: str):
    spec = importlib.util.spec_from_file_location(
        script.replace("/", "_"), REPO / script
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_cls_resume_roundtrip(tmp_path):
    tc = _load("scripts/train_cls.py")
    tc.train(tc.parse_args([
        "--classes", "2", "--batch_size", "8", "--npoints", "128",
        "--epoch", "2", "--train_batches", "2", "--val_batches", "1",
        "--tag", "RES", "--output_root", str(tmp_path),
    ]))
    (run,) = [p for p in tmp_path.iterdir() if p.name.endswith("_RES")]
    first_two = json.loads((run / "all_scalars.json").read_text())
    assert [s["epoch"] for s in first_two] == [1, 2]

    # bare --resume: saved target already reached -> no new epochs
    tc.train(tc.parse_args(["--resume", str(run)]))
    assert len(json.loads((run / "all_scalars.json").read_text())) == 2

    # --epoch 4 extends; first two scalar rows are preserved verbatim
    tc.train(tc.parse_args(["--resume", str(run), "--epoch", "4"]))
    scalars = json.loads((run / "all_scalars.json").read_text())
    assert [s["epoch"] for s in scalars] == [1, 2, 3, 4]
    assert scalars[:2] == first_two
    # optimizer step continued: 4 epochs x 2 batches
    meta = json.loads((run / "model_last.meta.json").read_text())
    assert meta["epoch"] == 3
    cfg = json.loads((run / "config.json").read_text())
    assert cfg["epoch"] == 4  # rewritten so a further resume sees the target


@pytest.mark.slow
def test_partseg_resume_roundtrip(tmp_path):
    tp = _load("scripts/train_partseg.py")
    tp.train(tp.parse_args([
        "--categories", "2", "--batch_size", "8", "--npoints", "128",
        "--epoch", "1", "--train_batches", "2", "--val_batches", "1",
        "--tag", "RES", "--output_root", str(tmp_path),
    ]))
    (run,) = [p for p in tmp_path.iterdir() if p.name.endswith("_RES")]
    tp.train(tp.parse_args(["--resume", str(run), "--epoch", "2"]))
    scalars = json.loads((run / "all_scalars.json").read_text())
    assert [s["epoch"] for s in scalars] == [1, 2]
    assert "val_ins_miou" in scalars[-1]
    best = json.loads((run / "model_best.meta.json").read_text())
    assert "val_part_miou" in best["best"]
