"""AOT export / serving tests (engine/export.py + scripts/infer.py).

The reference has no deployment path at all — inference requires the full
torch stack, the model source, and rebuilt CUDA extensions (reference
scripts/eval.py:174-221). These tests pin the TPU-native answer: the jitted
eval forward lowered to a self-contained StableHLO artifact that reproduces
the live model bit-for-bit after a serialize/deserialize roundtrip, plus the
unlabeled-scene inference CLI built on it.
"""

from __future__ import annotations

import functools
import pathlib
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.config import (
    DataConfig,
    ModelConfig,
    RunConfig,
    TrainConfig,
)
from pointnet2_scannet_tpu.engine.checkpoint import save_checkpoint
from pointnet2_scannet_tpu.engine.export import (
    ServingPredictor,
    export_forward,
    export_run,
    load_exported,
    save_exported,
)
from pointnet2_scannet_tpu.engine.train_state import create_train_state

REPO = pathlib.Path(__file__).resolve().parent.parent
N = 512  # tiny columns: the export contract is shape-agnostic


@functools.cache
def tiny_model():
    """Init a small SSG model once (xyz-only input) for the export tests."""
    model = models.get_model(num_classes=20, is_msg=False, input_channels=0)
    pc = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1.5, (1, N, 3)).astype(np.float32)
    )
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc, train=False))()

    @jax.jit
    def fwd(pc):
        return model.apply(variables, pc, train=False)

    return model, variables, fwd


def make_points(s, channels=3, seed=1):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1.5, (s, N, channels)).astype(np.float32)


class TestExportForward:
    def test_labels_match_live_apply_and_are_int8(self):
        model, variables, fwd = tiny_model()
        exported = export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3
        )
        x = make_points(2)
        got = np.asarray(jax.jit(exported.call)(x))
        want = np.argmax(np.asarray(fwd(x)), axis=-1)
        assert got.dtype == np.int8  # 20 classes fit the narrow transfer dtype
        np.testing.assert_array_equal(got, want)

    def test_logits_match_live_apply(self):
        model, variables, fwd = tiny_model()
        exported = export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3,
            emit="logits",
        )
        x = make_points(2, seed=2)
        got = np.asarray(jax.jit(exported.call)(x))
        np.testing.assert_allclose(got, np.asarray(fwd(x)), rtol=1e-6, atol=1e-6)

    def test_emit_validated(self):
        model, variables, _ = tiny_model()
        with pytest.raises(ValueError, match="emit"):
            export_forward(
                model.apply, variables, batch_size=1, npoints=N, channels=3,
                emit="probs",
            )

    def test_serialize_roundtrip_and_ragged_padding(self, tmp_path):
        """Deserialized artifact == live model; predictor pads S=5 onto B=2."""
        model, variables, fwd = tiny_model()
        exported = export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3
        )
        path = save_exported(exported, tmp_path / "m.jexp")
        assert path.stat().st_size > 0
        predictor = ServingPredictor.from_artifact(path)
        assert (predictor.batch_size, predictor.npoints, predictor.channels) == (
            2, N, 3,
        )
        x = make_points(5, seed=3)  # ragged: 2 full batches + 1 padded
        got = predictor.predict(x)
        want = np.argmax(np.asarray(fwd(x[:, :, :3])), axis=-1)
        assert got.shape == (5, N)
        np.testing.assert_array_equal(got, want)
        # shape contract is enforced, not silently re-padded
        with pytest.raises(ValueError, match="expected"):
            predictor.predict(make_points(2, channels=4))

    def test_empty_stack_returns_empty_contract_shape(self):
        """S=0 input short-circuits to an empty array of the output contract
        (no np.concatenate([]) crash), for both emit modes."""
        model, variables, _ = tiny_model()
        labels = ServingPredictor(export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3
        )).predict(np.zeros((0, N, 3), np.float32))
        assert labels.shape == (0, N) and labels.dtype == np.int8
        logits = ServingPredictor(export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3,
            emit="logits",
        )).predict(np.zeros((0, N, 3), np.float32))
        assert logits.shape == (0, N, 20)

    @pytest.mark.slow
    def test_multi_device_round_robin_matches_single(self):
        """devices=jax.devices() round-robins batches across the 8-device CPU
        mesh and reassembles outputs in order, bit-equal to single-device."""
        model, variables, _ = tiny_model()
        exported = export_forward(
            model.apply, variables, batch_size=2, npoints=N, channels=3
        )
        x = make_points(9, seed=7)  # 5 batches over 8 devices, ragged tail
        single = ServingPredictor(exported).predict(x)
        multi = ServingPredictor(exported, devices=jax.devices()).predict(x)
        assert len(jax.devices()) == 8
        np.testing.assert_array_equal(multi, single)

    def test_load_exported_roundtrip_platforms(self, tmp_path):
        model, variables, _ = tiny_model()
        exported = export_forward(
            model.apply, variables, batch_size=1, npoints=N, channels=3
        )
        save_exported(exported, tmp_path / "m.jexp")
        assert load_exported(tmp_path / "m.jexp").platforms == exported.platforms


def make_run_dir(tmp_path) -> tuple[pathlib.Path, RunConfig]:
    """A minimal trained-run directory: config.json + model_best.msgpack."""
    cfg = RunConfig(
        tag="export-test",
        data=DataConfig(npoints=N, use_color=True, use_normal=True),
        model=ModelConfig(is_msg=False),
        train=TrainConfig(batch_size=2, epochs=1),
    )
    model = models.get_model(
        num_classes=cfg.model.num_classes,
        is_msg=cfg.model.is_msg,
        input_channels=cfg.data.input_channels,
    )
    sample = jnp.zeros((1, N, 3 + cfg.data.input_channels), jnp.float32)
    state = jax.jit(
        lambda: create_train_state(
            model, jax.random.key(0), sample, optax.adam(1e-3)
        )
    )()
    save_checkpoint(
        tmp_path, "model_best", state, epoch=0, config_json=cfg.to_json()
    )
    return tmp_path, cfg


class TestExportRun:
    def test_export_run_matches_checkpointed_model(self, tmp_path):
        run_dir, cfg = make_run_dir(tmp_path)
        exported = export_run(run_dir, batch_size=2)
        c = 3 + cfg.data.input_channels
        assert tuple(map(int, exported.in_avals[0].shape)) == (2, N, c)

        from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only

        model = models.get_model(
            num_classes=cfg.model.num_classes,
            is_msg=cfg.model.is_msg,
            input_channels=cfg.data.input_channels,
        )
        variables = restore_params_only(run_dir, "model_best")
        x = make_points(2, channels=c, seed=4)
        want = np.argmax(
            np.asarray(jax.jit(lambda: model.apply(variables, x, train=False))()),
            axis=-1,
        )
        np.testing.assert_array_equal(
            np.asarray(jax.jit(exported.call)(x)), want
        )


def make_shape_run_dir(tmp_path, kind: str, npoints: int = 512):
    """A minimal shape-family run dir in the trainers' flat-argparse
    config.json format (scripts/train_cls.py / train_partseg.py)."""
    import json

    from pointnet2_scannet_tpu.data.shapes import num_parts_total
    from pointnet2_scannet_tpu.models import get_cls_model, get_partseg_model

    flat = {"npoints": npoints, "use_msg": False, "no_bn": False, "bf16": False}
    if kind == "partseg":
        flat["categories"] = 2
        flat["num_parts"] = num_parts_total(2)
        model = get_partseg_model(flat["num_parts"], 2)
        channels = 3 + 2
    else:
        flat["classes"] = 4
        model = get_cls_model(4)
        channels = 3
    sample = jnp.zeros((1, npoints, channels), jnp.float32)
    state = jax.jit(
        lambda: create_train_state(
            model, jax.random.key(0), sample, optax.adam(1e-3)
        )
    )()
    save_checkpoint(
        tmp_path, "model_best", state, epoch=0, config_json=json.dumps(flat)
    )
    return model, state, channels


class TestExportShapeFamilies:
    """export_run family dispatch: cls and partseg run dirs serve through
    the same artifact pipeline as semseg."""

    def test_cls_run_exports_and_matches_live_model(self, tmp_path):
        model, state, channels = make_shape_run_dir(tmp_path, "cls")
        exported = export_run(tmp_path, batch_size=2)
        assert tuple(map(int, exported.in_avals[0].shape)) == (2, N, channels)
        x = make_points(2, channels=channels, seed=5)
        got = ServingPredictor(exported).predict(x)
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        want = np.argmax(
            np.asarray(jax.jit(lambda: model.apply(vars_, x, train=False))()),
            axis=-1,
        )
        assert got.shape == (2,) and got.dtype == np.int8  # one id per cloud
        np.testing.assert_array_equal(got, want)

    def test_partseg_run_exports_and_matches_live_model(self, tmp_path):
        model, state, channels = make_shape_run_dir(tmp_path, "partseg")
        exported = export_run(tmp_path, batch_size=2)
        assert tuple(map(int, exported.in_avals[0].shape)) == (2, N, channels)
        x = make_points(3, channels=channels, seed=6)  # ragged onto B=2
        got = ServingPredictor(exported).predict(x)
        vars_ = {"params": state.params, "batch_stats": state.batch_stats}
        want = np.argmax(
            np.asarray(jax.jit(lambda: model.apply(vars_, x, train=False))()),
            axis=-1,
        )
        assert got.shape == (3, N) and got.dtype == np.int8
        np.testing.assert_array_equal(got, want)

    def test_infer_cli_rejects_shape_run_for_scene_inference(self, tmp_path):
        import argparse

        make_shape_run_dir(tmp_path, "cls")
        mod = TestLoadStoreWidths._infer_module()
        args = argparse.Namespace(
            folder=str(tmp_path), export=None, from_artifact="x.jexp",
            checkpoint="model_best", batch_size=None, npoints=None,
            emit="labels", platforms=None, data_dir=None, scene_list=None,
            multiview_h5=None, synthetic=True, synthetic_scenes=1,
            out=None, write_ply=False,
        )
        with pytest.raises(SystemExit, match="cls run"):
            mod.infer(args)


class TestLoadStoreWidths:
    """_load_store pads unlabeled clouds missing trailing layout columns and
    rejects clouds missing columns the run's feature config reads."""

    @staticmethod
    def _infer_module():
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "infer_cli", REPO / "scripts" / "infer.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def _args(self, tmp_path, sid="scene0"):
        import argparse

        (tmp_path / "list.txt").write_text(f"{sid}\n")
        return argparse.Namespace(
            synthetic=False, synthetic_scenes=1,
            scene_list=str(tmp_path / "list.txt"), data_dir=str(tmp_path),
            multiview_h5=None,
        )

    def test_pads_nine_column_cloud(self, tmp_path):
        mod = self._infer_module()
        cfg = RunConfig(data=DataConfig(use_color=True, use_normal=True))
        np.save(tmp_path / "scene0.npy", np.ones((7, 9), np.float32))
        store = mod._load_store(self._args(tmp_path), cfg)
        arr = store.scenes["scene0"]
        assert arr.shape == (7, 11)
        np.testing.assert_array_equal(arr[:, 9:], 0)  # padded instance+label
        np.testing.assert_array_equal(arr[:, :9], 1)

    def test_rejects_missing_feature_columns(self, tmp_path):
        mod = self._infer_module()
        cfg = RunConfig(data=DataConfig(use_color=True, use_normal=True))
        np.save(tmp_path / "scene0.npy", np.ones((7, 6), np.float32))
        with pytest.raises(SystemExit, match="first 9 columns"):
            mod._load_store(self._args(tmp_path), cfg)


@pytest.mark.slow
def test_infer_cli_synthetic_and_artifact_roundtrip(tmp_path):
    """Drive scripts/infer.py as a subprocess: export an artifact, then run
    unlabeled-scene inference from it (the no-model-code serving path)."""
    run_dir, cfg = make_run_dir(tmp_path)

    def run_cli(args, timeout=900):
        boot = (
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            f"import runpy, sys; sys.argv = ['scripts/infer.py'] + {args!r}; "
            f"runpy.run_path({str(REPO / 'scripts/infer.py')!r}, "
            "run_name='__main__')"
        )
        proc = subprocess.run(
            [sys.executable, "-c", boot],
            cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
        assert proc.returncode == 0, (
            f"infer.py {args} failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}"
        )
        return proc.stdout

    artifact = tmp_path / "model.jexp"
    out = run_cli(
        ["--folder", str(run_dir), "--export", str(artifact), "--batch_size", "2"]
    )
    assert "exported model_best" in out and artifact.exists()

    out = run_cli(
        ["--folder", str(run_dir), "--from_artifact", str(artifact),
         "--synthetic", "--synthetic_scenes", "1", "--write_ply",
         "--out", str(tmp_path / "preds")]
    )
    preds = sorted((tmp_path / "preds").glob("*_pred.npy"))
    assert len(preds) == 1
    arr = np.load(preds[0])
    assert arr.ndim == 2 and arr.shape[1] == 4 and len(arr) > 0
    labels = arr[:, 3]
    assert labels.min() >= 0 and labels.max() < cfg.model.num_classes
    assert (tmp_path / "preds" / preds[0].name.replace("_pred.npy", "_pred.ply")).exists()
