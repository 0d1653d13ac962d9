"""Data-layer tests: synthetic scenes, chunk sampling, augmentation,
label weighting, batching, whole-scene tiling."""

import numpy as np
import pytest

from pointnet2_scannet_tpu.config import DataConfig, NUM_CLASSES
from pointnet2_scannet_tpu.data import (
    BatchLoader,
    ChunkedSceneDataset,
    WholeSceneDataset,
    compute_label_weights,
)
from pointnet2_scannet_tpu.data.chunks import augment_coords
from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene, make_synthetic_store

CFG = DataConfig(npoints=2048, use_color=True, use_normal=True)


@pytest.fixture(scope="module")
def store():
    return make_synthetic_store(n_scenes=2, n_points=20_000)


class TestSynthetic:
    def test_scene_layout(self):
        scene = make_synthetic_scene(0, n_points=10_000)
        assert scene.shape[1] == 11
        labels = scene[:, 10]
        assert labels.min() >= 0 and labels.max() < NUM_CLASSES
        assert (scene[:, 3:6] >= 0).all() and (scene[:, 3:6] <= 255).all()
        norms = np.linalg.norm(scene[:, 6:9], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestLabelWeights:
    def test_inverse_log_freq(self):
        labels = [np.array([0, 0, 0, 1])]
        w = compute_label_weights(labels, num_classes=3)
        freq = np.array([0.75, 0.25, 0.0], np.float32)
        np.testing.assert_allclose(w, 1.0 / np.log(1.2 + freq), rtol=1e-6)
        # rarer classes get larger weights
        assert w[1] > w[0] and w[2] > w[1]


class TestChunks:
    def test_generate_and_get(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="train", seed=1)
        ds.generate_chunks()
        feats, labels, weights = ds.get_item(0)
        assert feats.shape == (2048, 9)  # xyz + color + normal
        assert labels.shape == (2048,) and labels.dtype == np.int32
        assert weights.shape == (2048,) and (weights > 0).all()
        # chunk footprint: 1.5m + margins + augmentation slack
        span = feats[:, :3].max(0) - feats[:, :3].min(0)
        assert span[0] < 1.5 + 2 * 0.2 + 1.2
        assert span[1] < 1.5 + 2 * 0.2 + 1.2

    def test_chunks_change_between_epochs(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="val", seed=1)
        ds.generate_chunks()
        a = ds.get_item(0)[0].copy()
        ds.generate_chunks()
        b = ds.get_item(0)[0]
        assert not np.array_equal(a, b)

    def test_val_has_no_augmentation(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="val", seed=3)
        ds.generate_chunks()
        a = ds.get_item(0)[0]
        b = ds.get_item(0)[0]
        np.testing.assert_array_equal(a, b)


class TestAugment:
    def test_all_cases_bounded(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(0, 1.5, size=(500, 3)).astype(np.float32)
        for _ in range(50):
            out = augment_coords(coords, rng)
            # translation <=0.5/axis, rotation <=5deg, scale in [0.95,1.05]:
            # centroid moves at most ~0.9m, shape roughly preserved
            assert np.linalg.norm(out.mean(0) - coords.mean(0)) < 1.0
            r_in = np.linalg.norm(coords - coords.mean(0), axis=1).max()
            r_out = np.linalg.norm(out - out.mean(0), axis=1).max()
            assert 0.9 * r_in < r_out < 1.1 * r_in


class TestBatchLoader:
    def test_shapes_and_len(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="train", seed=1)
        ds.generate_chunks()
        loader = BatchLoader(ds, batch_size=2)
        batches = list(loader)
        assert len(batches) == len(loader) == 1
        assert batches[0]["points"].shape == (2, 2048, 9)
        assert batches[0]["labels"].shape == (2, 2048)
        assert batches[0]["weights"].shape == (2, 2048)
        np.testing.assert_array_equal(batches[0]["row_mask"], [1.0, 1.0])

    def test_pad_last_masks_padding(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="val", seed=1)
        ds.generate_chunks()
        loader = BatchLoader(ds, batch_size=4, pad_last=True)  # 2 scenes -> pad 2
        (batch,) = list(loader)
        assert batch["points"].shape == (4, 2048, 9)
        np.testing.assert_array_equal(batch["row_mask"], [1, 1, 0, 0])
        assert (batch["weights"][2:] == 0).all()

    def test_drop_last(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="val", seed=1)
        ds.generate_chunks()
        loader = BatchLoader(ds, batch_size=4, drop_last=True)
        assert len(list(loader)) == len(loader) == 0


class TestWholeScene:
    def test_tiling_covers_scene(self, store):
        ds = WholeSceneDataset(store, CFG, seed=0)
        feats, labels, weights = ds.get_scene(0)
        S = feats.shape[0]
        assert feats.shape == (S, 2048, 9)
        assert labels.shape == (S, 2048)
        assert S >= 4  # a 6m x 6m scene has >= 16 1.5m columns
        # every column footprint is at most the window + tolerance
        for s in range(S):
            span = feats[s, :, :3].max(0) - feats[s, :, :3].min(0)
            assert span[0] <= 1.5 + 0.03 and span[1] <= 1.5 + 0.03


class TestWholeSceneDegenerate:
    def test_planar_scene_yields_one_column(self):
        # zero x-extent (single planar wall): nx must clamp to 1, not 0 —
        # an unclamped ceil(0/1.5)=0 made np.stack([]) crash the tiler
        from pointnet2_scannet_tpu.data.scene_store import SceneStore

        rng = np.random.default_rng(0)
        scene = np.zeros((5000, 11), np.float32)
        scene[:, 1] = rng.uniform(0, 1.0, 5000)  # y spread
        scene[:, 2] = rng.uniform(0, 2.0, 5000)  # z spread; x all zero
        scene[:, 10] = rng.integers(0, NUM_CLASSES, 5000)
        store = SceneStore(["wall"], {"wall": scene})
        ds = WholeSceneDataset(store, CFG, seed=0)
        feats, labels, weights = ds.get_scene(0)
        assert feats.shape[0] >= 1
        assert feats.shape[1:] == (2048, 9)


class TestTileColumns:
    def _reference_tiling(self, xyz, coordmin, coordmax, L, tol=0.01):
        """The pre-optimization per-column mask loop (lib/dataset.py:316-337
        semantics) — the oracle the O(N) binned tiler must match bit-for-bit."""
        nx = int(np.ceil((coordmax[0] - coordmin[0]) / L))
        ny = int(np.ceil((coordmax[1] - coordmin[1]) / L))
        counts = np.zeros((nx, ny), np.int64)
        members = []
        for i in range(nx):
            for j in range(ny):
                curmin = coordmin + [i * L, j * L, 0]
                curmax = coordmin + [
                    (i + 1) * L,
                    (j + 1) * L,
                    coordmax[2] - coordmin[2],
                ]
                mask = np.all(
                    (xyz >= curmin - tol) & (xyz <= curmax + tol), axis=1
                )
                idx = np.flatnonzero(mask)
                counts[i, j] = len(idx)
                members.append(idx.astype(np.int64))
        return counts, np.concatenate(members)

    def test_native_matches_reference_loop(self):
        from pointnet2_scannet_tpu.utils import native

        rng = np.random.default_rng(3)
        # spread over several columns; include points exactly on column
        # borders (multiples of L) to exercise the +-tol overlap membership
        xyz = rng.uniform(0, 4.5, (20_000, 3)).astype(np.float32)
        xyz[:64, 0] = 1.5
        xyz[64:128, 1] = 3.0
        xyz[128:160, :2] = [1.5, 1.5]
        coordmin = xyz.min(axis=0)
        coordmax = xyz.max(axis=0)
        L = 1.5
        nx = int(np.ceil((coordmax[0] - coordmin[0]) / L))
        ny = int(np.ceil((coordmax[1] - coordmin[1]) / L))
        want_counts, want_members = self._reference_tiling(
            xyz, coordmin, coordmax, L
        )
        got_counts, got_members = native.tile_columns(
            xyz,
            coordmin,
            float(np.float32(coordmax[2] - coordmin[2])),
            L,
            0.01,
            nx,
            ny,
        )
        np.testing.assert_array_equal(got_counts, want_counts)
        np.testing.assert_array_equal(got_members, want_members)
        # border points really do land in more than one column
        assert np.sum(want_counts) > len(xyz)

    def test_numpy_fallback_matches_native(self, monkeypatch):
        from pointnet2_scannet_tpu.utils import native

        rng = np.random.default_rng(4)
        xyz = rng.uniform(0, 3.2, (5_000, 3)).astype(np.float32)
        coordmin, coordmax = xyz.min(axis=0), xyz.max(axis=0)
        z = float(np.float32(coordmax[2] - coordmin[2]))
        args = (xyz, coordmin, z, 1.5, 0.01, 3, 3)
        got = native.tile_columns(*args)
        monkeypatch.setattr(native, "_load", lambda: None)
        want = native.tile_columns(*args)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])


class TestAsyncRegen:
    def test_async_regen_swaps_next_epoch(self, store):
        ds = ChunkedSceneDataset(store, CFG, phase="val", seed=5)
        ds.generate_chunks()
        first = {k: v[0].copy() for k, v in ds.chunks.items()}
        ds.start_regen_async()
        ds.generate_chunks()  # must consume the async result
        assert ds._regen_thread is None and ds._next is None
        changed = any(
            not np.array_equal(first[k], ds.chunks[k][0]) for k in first
        )
        assert changed

    def test_sync_and_async_streams_match(self, store):
        # same seed: async path must produce the same chunk stream as sync
        a = ChunkedSceneDataset(store, CFG, phase="val", seed=9)
        b = ChunkedSceneDataset(store, CFG, phase="val", seed=9)
        a.generate_chunks(); a.generate_chunks()
        b.generate_chunks(); b.start_regen_async(); b.generate_chunks()
        for k in a.chunks:
            np.testing.assert_array_equal(a.chunks[k][0], b.chunks[k][0])


class TestMultiviewDataPath:
    def make_mv_store(self, tmp_path, n_scenes=2, n_points=12_000):
        from pointnet2_scannet_tpu.data.multiview import write_multiview_h5
        from pointnet2_scannet_tpu.data.scene_store import SceneStore
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene

        rng = np.random.default_rng(0)
        scenes, feats = {}, {}
        for i in range(n_scenes):
            sid = f"synth{i:04d}_00"
            scenes[sid] = make_synthetic_scene(i, n_points=n_points)
            feats[sid] = rng.normal(size=(len(scenes[sid]), 128)).astype(np.float32)
        # roundtrip the fused features through the HDF5 layout
        h5 = tmp_path / "enet_feats.hdf5"
        write_multiview_h5(h5, feats)
        npy_dir = tmp_path / "scenes"
        npy_dir.mkdir()
        for sid, s in scenes.items():
            np.save(npy_dir / f"{sid}.npy", s)
        store = SceneStore.from_npy_dir(sorted(scenes), npy_dir, h5)
        return store, feats

    def test_h5_roundtrip_and_chunked_columns(self, tmp_path):
        store, feats = self.make_mv_store(tmp_path)
        sid = store.scene_ids[0]
        np.testing.assert_allclose(store.multiview[sid], feats[sid])

        cfg = DataConfig(npoints=512, use_color=True, use_normal=True,
                         use_multiview=True)
        ds = ChunkedSceneDataset(store, cfg, phase="train", seed=0)
        ds.generate_chunks()
        f, l, w = ds.get_item(0)
        assert f.shape == (512, 3 + 3 + 3 + 128)
        # multiview columns land LAST in the canonical order
        chunk, mv = ds.chunks[sid]
        np.testing.assert_allclose(f[:, -128:], mv)

    def test_wholescene_multiview_columns(self, tmp_path):
        store, feats = self.make_mv_store(tmp_path, n_scenes=1)
        cfg = DataConfig(npoints=256, use_normal=True, use_multiview=True)
        ds = WholeSceneDataset(store, cfg, seed=0)
        f, l, w = ds.get_scene(0)
        assert f.shape[2] == 3 + 3 + 128
        assert np.abs(f[..., -128:]).sum() > 0


class TestVirtualScan:
    def test_visibility_subsampling(self):
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene
        from pointnet2_scannet_tpu.utils.scene_util import virtual_scan

        scene = make_synthetic_scene(0, n_points=40_000)
        idx = virtual_scan(scene[:, :3], mode=2)
        assert len(idx) >= 100
        assert len(idx) < len(scene)  # a scan sees only part of the scene
        assert len(set(idx.tolist())) == len(idx)
        # occlusion: a near wall must hide the far wall behind it.
        # camera looks along az=pi/2 (+y): points with larger y along the view
        # should be culled when a closer surface shares the ray
        sub = scene[idx, :3]
        assert np.isfinite(sub).all()

    def test_empty_when_no_points_in_view(self):
        from pointnet2_scannet_tpu.utils.scene_util import virtual_scan

        # points far behind every possible camera mode-0 viewing direction
        rng = np.random.default_rng(0)
        xyz = rng.uniform(-0.1, 0.0, size=(500, 3)) - [50, 0, 0]
        idx = virtual_scan(xyz, mode=4)  # looking along -x from mean-based cam
        assert idx.shape[0] == 0 or idx.shape[0] >= 100


class TestShardedStore:
    """Multi-host data layer: SceneStore.shard / from_npy_dir_sharded keep
    the GLOBAL split's label weights while holding only this process's
    scenes (parallel/distributed.py contract)."""

    def _npy_dir(self, tmp_path, n=5):
        from pointnet2_scannet_tpu.data.synthetic import make_synthetic_scene

        npy_dir = tmp_path / "scenes"
        npy_dir.mkdir()
        ids = []
        for i in range(n):
            sid = f"synth{i:04d}_00"
            np.save(npy_dir / f"{sid}.npy", make_synthetic_scene(i, n_points=6000))
            ids.append(sid)
        return npy_dir, ids

    def test_sharded_loader_matches_full_weights(self, tmp_path):
        from pointnet2_scannet_tpu.data.scene_store import SceneStore

        npy_dir, ids = self._npy_dir(tmp_path)
        full = SceneStore.from_npy_dir(ids, npy_dir)
        shards = [
            SceneStore.from_npy_dir_sharded(
                ids, npy_dir, process_id=p, num_processes=2
            )
            for p in range(2)
        ]
        # disjoint equal shards (5 -> 2+2, one dropped), only shard scenes
        # resident, and bit-identical GLOBAL weights on every process
        assert [len(s) for s in shards] == [2, 2]
        assert not set(shards[0].scene_ids) & set(shards[1].scene_ids)
        for s in shards:
            assert set(s.scenes) == set(s.scene_ids)
            np.testing.assert_array_equal(s.label_weights, full.label_weights)

    def test_store_shard_preserves_weights(self, tmp_path):
        from pointnet2_scannet_tpu.data.scene_store import SceneStore

        npy_dir, ids = self._npy_dir(tmp_path, n=4)
        full = SceneStore.from_npy_dir(ids, npy_dir)
        sub = full.shard(1, 2)
        assert sub.scene_ids == ids[1::2]
        np.testing.assert_array_equal(sub.label_weights, full.label_weights)
        assert full.shard(0, 1) is full  # single-process no-op
