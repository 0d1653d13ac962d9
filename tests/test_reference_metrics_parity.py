"""Metrics + data-layer parity vs the ACTUAL reference code (VERDICT r2 #7).

The reference metric library (/root/reference/scripts/eval.py:40-124) and
dataset (/root/reference/lib/dataset.py) are pure numpy/torch once their
import-time obstacles are shimmed (lib.config's hardcoded-path os.listdir,
easydict, prefetch_generator, plyfile, np.float on numpy>=2) — the same
approach tests/torch_ref.py takes for `pointnet2._ext`. This runs them
in-process against this framework's engine.metrics and data layer:

  - compute_acc / compute_miou on shared random labeled clouds,
  - label-weight vectors from ScannetDataset._prepare_weights,
  - __getitem__ feature assembly / per-point weights on an injected chunk,
  - generate_chunks acceptance statistics (exact RNG parity impossible —
    the reference draws from global np.random; compared statistically).

Known, documented divergence: the reference dedups coords by PYTHON STRING
HASH (eval.py:42-44), so its dedup ORDER — and hence which point represents
a voxel — is PYTHONHASHSEED-dependent and varies run to run; point-tier
metrics are order-invariant (compared exactly), voxel-tier metrics are
compared exactly on voxel-consistent data and with a small tolerance on
conflicting data (the reference's own run-to-run variance).
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys
import types

import numpy as np
import pytest

from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.scene_store import SceneStore
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene
from pointnet2_scannet_tpu.config import DataConfig
from pointnet2_scannet_tpu.engine import metrics as M

torch = pytest.importorskip("torch")

REF = pathlib.Path("/root/reference")


class _EasyDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def _install_shims(scene_dir: str):
    if not hasattr(np, "float"):
        np.float = float  # numpy>=2 removed the alias; eval.py:91 uses it
    ed = types.ModuleType("easydict")
    ed.EasyDict = _EasyDict
    sys.modules.setdefault("easydict", ed)
    pg = types.ModuleType("prefetch_generator")

    def background(max_prefetch=1):
        def deco(fn):
            return fn

        return deco

    pg.background = background
    sys.modules.setdefault("prefetch_generator", pg)
    pf = types.ModuleType("plyfile")
    pf.PlyData, pf.PlyElement = object, object
    sys.modules.setdefault("plyfile", pf)

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    # fake lib.config BEFORE anything imports it (the real one os.listdirs a
    # hardcoded cluster path at import time, lib/config.py:24)
    conf_mod = types.ModuleType("lib.config")
    CONF = _EasyDict()
    CONF.NUM_CLASSES = 20
    CONF.SCANNETV2_FILE = scene_dir + "/{}.npy"
    CONF.MULTIVIEW = scene_dir + "/none.hdf5"
    conf_mod.CONF = CONF
    sys.modules["lib.config"] = conf_mod
    return CONF


@pytest.fixture(scope="module")
def ref_stack(tmp_path_factory):
    """(ref_eval module, ref lib.dataset module, scene_dir with synthetic
    scenes saved in the reference's (N, 11) npy layout)."""
    scene_dir = tmp_path_factory.mktemp("ref_scenes")
    scenes = {
        f"scene{i:04d}_00": make_synthetic_scene(seed=100 + i, n_points=12_000)
        for i in range(4)
    }
    for sid, arr in scenes.items():
        np.save(scene_dir / f"{sid}.npy", arr)
    _install_shims(str(scene_dir))
    spec = importlib.util.spec_from_file_location(
        "ref_eval", REF / "scripts" / "eval.py"
    )
    ref_eval = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_eval)
    import lib.dataset as ref_dataset

    # lib.dataset may ALREADY be imported by another parity module (the
    # eval-parity suite runs first in the full lane) holding the CONF object
    # of a PREVIOUS _install_shims call, mutated to THAT module's scene dir —
    # re-pin the object the cached module actually reads (same pattern as
    # test_reference_eval_parity._make_capture; order-dependent leak observed
    # as scene0003_00.npy lookups in the eval-parity capture dir)
    ref_dataset.CONF.SCANNETV2_FILE = str(scene_dir) + "/{}.npy"
    ref_dataset.CONF.NUM_CLASSES = 20
    ref_dataset.CONF.MULTIVIEW = str(scene_dir) + "/none.hdf5"

    return ref_eval, ref_dataset, scenes, str(scene_dir)


def _random_cloud(rng, n=6000, dup=True, voxel_consistent=False):
    """Labeled cloud with exact duplicate coords (exercises the dedup)."""
    if voxel_consistent:
        # coords on a 0.1 grid: points 0.1 apart can never share a 0.02
        # surface voxel (under ANY offset convention), and labels/preds are a
        # function of the grid cell — so neither the dedup order nor the
        # voxel representative-point choice can matter; every metric output
        # must then match the reference EXACTLY.
        # voxel_consistent="boundary" drops the +0.05 half-cell offset so
        # every coord sits EXACTLY on a 0.02 bin boundary (f32(k*0.1)/0.02
        # is an exact integer in f32 but not f64) — the binning-arithmetic
        # class where the native voxelizer once diverged from the
        # reference's all-f32 numpy formula
        key = rng.integers(0, 20, (n // 2 if dup else n, 3))
        off = 0.0 if voxel_consistent == "boundary" else 0.05
        pool = (key * 0.1 + off).astype(np.float32)
        idx = rng.integers(0, len(pool), n)
        coords = pool[idx]
        k = key[idx]
        h = k[:, 0] * 73856093 + k[:, 1] * 19349663 + k[:, 2] * 83492791
        targets = (h % 20).astype(np.int64)
        preds = ((h // 7) % 20).astype(np.int64)
    else:
        pool = rng.uniform(0, 2.0, (n // 2 if dup else n, 3)).astype(np.float32)
        idx = rng.integers(0, len(pool), n)
        coords = pool[idx]
        targets = rng.integers(0, 20, n)
        preds = np.where(
            rng.uniform(size=n) < 0.6, targets, rng.integers(0, 20, n)
        )
    weights = rng.uniform(0.5, 2.0, n).astype(np.float32)
    return coords, preds.astype(np.int64), targets.astype(np.int64), weights


class TestMetricsParity:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_voxel_consistent_exact(self, ref_stack, seed):
        ref_eval = ref_stack[0]
        rng = np.random.default_rng(seed)
        c, p, t, w = _random_cloud(rng, voxel_consistent=True)
        ref_acc = ref_eval.compute_acc(c, p, t, w)
        our_acc = M.compute_acc(c, p, t, w, 20)
        for i, (a, b) in enumerate(zip(our_acc, ref_acc)):
            # atol 1e-9: the reference normalizes its calibration weights in
            # float32 (eval.py:89-91), ours stay float64
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-9,
                err_msg=f"compute_acc output {i}",
            )
        ref_miou = ref_eval.compute_miou(c, p, t, w)
        our_miou = M.compute_miou(c, p, t, w, 20)
        for i, (a, b) in enumerate(zip(our_miou, ref_miou)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=0,
                err_msg=f"compute_miou output {i}",
            )

    def test_boundary_grid_exact(self, ref_stack):
        """Coords exactly on voxel-bin boundaries: native binning must match
        the reference's f32 formula bit-for-bit (regression for the f64
        division bug in cpp/hostops.cpp voxelize_unique)."""
        ref_eval = ref_stack[0]
        rng = np.random.default_rng(3)
        c, p, t, w = _random_cloud(rng, voxel_consistent="boundary")
        ref_acc = ref_eval.compute_acc(c, p, t, w)
        our_acc = M.compute_acc(c, p, t, w, 20)
        for i, (a, b) in enumerate(zip(our_acc, ref_acc)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-9,
                err_msg=f"compute_acc output {i}",
            )
        ref_miou = ref_eval.compute_miou(c, p, t, w)
        our_miou = M.compute_miou(c, p, t, w, 20)
        for i, (a, b) in enumerate(zip(our_miou, ref_miou)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-12, atol=0,
                err_msg=f"compute_miou output {i}",
            )

    def test_conflicting_voxels_point_tier_exact(self, ref_stack):
        """Random preds: point-tier metrics are dedup-order-invariant and
        must match exactly; voxel-tier within the reference's own
        hash-order variance."""
        ref_eval = ref_stack[0]
        rng = np.random.default_rng(7)
        c, p, t, w = _random_cloud(rng, voxel_consistent=False)
        ref_pa, ref_papc, ref_va, ref_vapc, ref_cali, ref_mask = (
            ref_eval.compute_acc(c, p, t, w)
        )
        pa, papc, va, vapc, cali, mask = M.compute_acc(c, p, t, w, 20)
        assert pa == ref_pa
        np.testing.assert_array_equal(papc, ref_papc)
        np.testing.assert_array_equal(mask, ref_mask)
        np.testing.assert_allclose(va, ref_va, atol=5e-3)
        np.testing.assert_allclose(vapc, ref_vapc, atol=2e-2)
        np.testing.assert_allclose(cali, ref_cali, atol=5e-3)
        ref_pm, ref_vm, _ = ref_eval.compute_miou(c, p, t, w)
        pm, vm, _ = M.compute_miou(c, p, t, w, 20)
        np.testing.assert_allclose(pm, ref_pm, rtol=1e-12)
        np.testing.assert_allclose(vm, ref_vm, atol=2e-2)


class TestDatasetParity:
    def test_label_weights_exact(self, ref_stack):
        _, ref_dataset, scenes, scene_dir = ref_stack
        ids = sorted(scenes)
        ref_ds = ref_dataset.ScannetDataset("val", ids)  # num_classes=21 quirk
        store = SceneStore.from_scenes(scenes)
        # the reference histograms 21 bins (lib/dataset.py:15 vs config 20,
        # SURVEY quirk 4); with no label-20 points the first 20 entries agree
        np.testing.assert_allclose(
            store.label_weights, ref_ds.labelweights[:20], rtol=1e-6
        )

    def test_getitem_on_injected_chunk(self, ref_stack):
        """Identical chunk through both __getitem__ paths (phase=val, no
        augmentation): features, labels, per-point weights must be equal."""
        _, ref_dataset, scenes, _ = ref_stack
        ids = sorted(scenes)
        ref_ds = ref_dataset.ScannetDataset(
            "val", ids, use_color=True, use_normal=True
        )
        cfg = DataConfig(npoints=4096, use_color=True, use_normal=True)
        store = SceneStore.from_scenes(scenes)
        ours = ChunkedSceneDataset(store, cfg, phase="val", seed=3)
        ours.generate_chunks()
        for i, sid in enumerate(ids):
            chunk, _ = ours.chunks[sid]
            ref_ds.chunk_data[sid] = chunk  # inject OUR chunk into the ref
            point_set, label, sample_weight, _ = ref_ds[i]
            feats, labels, weights = ours.get_item(i)
            np.testing.assert_allclose(feats, point_set.astype(np.float32), rtol=1e-6)
            np.testing.assert_array_equal(labels, label)
            np.testing.assert_allclose(weights, sample_weight, rtol=2e-6)

    def test_chunk_statistics_match(self, ref_stack):
        """generate_chunks acceptance behavior, statistically: per-chunk
        annotated fraction and label distribution over repeated regens."""
        _, ref_dataset, scenes, _ = ref_stack
        ids = sorted(scenes)
        ref_ds = ref_dataset.ScannetDataset("train", ids)  # npoints=8192
        cfg = DataConfig(npoints=8192)
        store = SceneStore.from_scenes(scenes)
        ours = ChunkedSceneDataset(store, cfg, phase="train", seed=9)

        def chunk_stats(chunks):
            """Low-variance per-chunk statistics: annotated fraction and the
            floor/wall/object super-class split (per-object-class histograms
            have huge per-draw variance — a 1.5 m chunk catches a handful of
            the scene's ~12 objects)."""
            fr, groups, extents = [], [], []
            for c in chunks:
                lab = c[:, 10].astype(np.int64)
                fr.append(np.mean(lab > 0))
                groups.append(
                    [np.mean(lab == 0), np.mean(lab == 1), np.mean(lab >= 2)]
                )
                xy = c[:, :2]
                extents.append((xy.max(0) - xy.min(0)).max())
            return np.mean(fr), np.mean(groups, axis=0), np.mean(extents)

        np.random.seed(123)
        ref_fr, ref_grp, ref_ext = [], [], []
        our_fr, our_grp, our_ext = [], [], []
        for _ in range(10):
            ref_ds.generate_chunks()
            f, g, e = chunk_stats([ref_ds.chunk_data[s] for s in ids])
            ref_fr.append(f)
            ref_grp.append(g)
            ref_ext.append(e)
            ours.generate_chunks()
            f, g, e = chunk_stats([ours.chunks[s][0] for s in ids])
            our_fr.append(f)
            our_grp.append(g)
            our_ext.append(e)
        # both samplers draw valid chunks from the same scenes: the mean
        # annotated fraction, super-class split, and chunk extent must agree
        # within sampling noise
        assert abs(np.mean(ref_fr) - np.mean(our_fr)) < 0.05, (
            np.mean(ref_fr),
            np.mean(our_fr),
        )
        np.testing.assert_allclose(
            np.mean(ref_grp, axis=0), np.mean(our_grp, axis=0), atol=0.06
        )
        # chunk footprint: 1.5 m + 2 x 0.2 margin on both sides
        assert abs(np.mean(ref_ext) - np.mean(our_ext)) < 0.1
        assert max(ref_ext) <= 1.9 + 1e-5 and max(our_ext) <= 1.9 + 1e-5
        # (no per-chunk >=0.7 assertion: BOTH samplers keep the forced 5th
        # retry even when invalid — dataset.py:219-240 — so occasional
        # below-threshold chunks are correct parity behavior)
