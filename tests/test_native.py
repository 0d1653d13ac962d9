"""Native host-ops library: builds, and matches the numpy reference paths."""

import numpy as np
import pytest

from pointnet2_scannet_tpu.utils import native

RNG = np.random.default_rng(3)


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("native hostops library failed to build")


class TestChunkScan:
    def numpy_ref(self, xyz, labels, lo, hi, margin):
        mask = np.all((xyz >= lo - margin) & (xyz <= hi + margin), axis=1)
        sel, lab = xyz[mask], labels[mask]
        annotated = int(np.sum(lab > 0))
        tight = np.all((sel >= lo - 0.01) & (sel <= hi + 0.01), axis=1)
        extent = hi - lo
        vidx = np.ceil((sel[tight] - lo) / extent * [31.0, 31.0, 62.0])
        vidx = np.unique(vidx[:, 0] * 31.0 * 62.0 + vidx[:, 1] * 62.0 + vidx[:, 2])
        return mask, annotated, len(vidx)

    def test_matches_numpy(self):
        xyz = RNG.uniform(0, 4, size=(5000, 3)).astype(np.float32)
        labels = RNG.integers(0, 20, 5000).astype(np.float32)
        lo = np.array([1.0, 1.0, 0.0], np.float32)
        hi = np.array([2.5, 2.5, 4.0], np.float32)
        got = native.chunk_scan(xyz, labels, lo, hi, 0.2)
        want = self.numpy_ref(xyz, labels, lo, hi, 0.2)
        np.testing.assert_array_equal(got[0], want[0])
        assert got[1] == want[1]
        assert got[2] == want[2]


class TestUnique:
    def test_matches_np_unique(self):
        keys = RNG.integers(0, 500, 4000)
        got_keys, got_idx = native.unique_first_occurrence(keys)
        want_keys, want_idx = np.unique(keys, return_index=True)
        np.testing.assert_array_equal(got_keys, want_keys)
        np.testing.assert_array_equal(got_idx, want_idx)


class TestCoordDedup:
    def test_matches_np_unique_rows(self):
        coords = RNG.uniform(size=(300, 3)).astype(np.float32)
        dup = np.concatenate([coords, coords[:100], coords[:30]])
        got = native.coord_first_occurrence(dup)
        view = np.ascontiguousarray(dup).view(np.dtype((np.void, 12))).ravel()
        _, want = np.unique(view, return_index=True)
        np.testing.assert_array_equal(np.sort(got), np.sort(want))
        assert len(got) == 300


class TestVoxelizeUnique:
    def test_matches_numpy_formula(self):
        # native fused ids+unique vs the numpy promotion chain it replicates
        # (every op f32: subtract, divide, ceil, accumulate; int64 truncate)
        coords = RNG.uniform(0, 5, size=(4000, 3)).astype(np.float32)
        coords = np.concatenate([coords, coords[:500]])  # duplicate rows
        res = 0.02
        coordmin = coords.min(axis=0)
        coordmax = coords.max(axis=0)
        nvox = np.ceil((coordmax - coordmin) / res)
        got_keys, got_idx = native.voxelize_unique(coords, res, coordmin, nvox)
        vidx = np.ceil((coords - coordmin) / res)
        vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
        want_keys, want_idx = np.unique(vidx.astype(np.int64), return_index=True)
        np.testing.assert_array_equal(got_keys, want_keys.astype(np.float64))
        np.testing.assert_array_equal(got_idx, want_idx)

    def test_voxel_boundary_points_f32_division(self):
        # f32(0.1)/0.02 is exactly 5.0 in f32 but 5.0000000745 in f64 — a
        # boundary point must bin like the f32 numpy formula (voxel 5, not 6).
        coords = np.array(
            [[0, 0, 0], [0.1, 0, 0], [0.3, 0.3, 0.3]], np.float32
        )
        # boundary multiples of res stress-test every component
        grid = RNG.integers(0, 200, size=(2000, 3)).astype(np.float32) * 0.02
        coords = np.concatenate([coords, grid])
        res = 0.02
        coordmin = coords.min(axis=0)
        nvox = np.ceil((coords.max(axis=0) - coordmin) / res)
        got_keys, got_idx = native.voxelize_unique(coords, res, coordmin, nvox)
        vidx = np.ceil((coords - coordmin) / res)
        vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
        want_keys, want_idx = np.unique(vidx.astype(np.int64), return_index=True)
        np.testing.assert_array_equal(got_keys, want_keys.astype(np.float64))
        np.testing.assert_array_equal(got_idx, want_idx)

    def test_f64_coords_take_numpy_path(self):
        coords = RNG.uniform(0, 2, size=(500, 3))  # float64
        res = 0.02
        coordmin = coords.min(axis=0)
        nvox = np.ceil((coords.max(axis=0) - coordmin) / res)
        got_keys, got_idx = native.voxelize_unique(coords, res, coordmin, nvox)
        vidx = np.ceil((coords - coordmin) / res)
        vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
        want_keys, want_idx = np.unique(vidx.astype(np.int64), return_index=True)
        np.testing.assert_array_equal(got_keys, want_keys.astype(np.float64))
        np.testing.assert_array_equal(got_idx, want_idx)


class TestDedupVoxelize:
    def test_matches_two_step_path(self):
        # coarse res forces voxel collisions; duplicated rows force dedup
        coords = RNG.uniform(0, 5, size=(3000, 3)).astype(np.float32)
        coords = np.concatenate([coords, coords[:700]])
        res = 0.5
        cmin = coords.min(0)
        nvox = np.ceil((coords.max(0) - cmin) / res)
        out = native.dedup_voxelize(coords, res, cmin, nvox)
        assert out is not None
        keep, vox = out
        ids = native.coord_first_occurrence(coords)
        np.testing.assert_array_equal(keep, ids)
        vidx = np.ceil((coords[ids] - cmin) / res)
        vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
        _, want_pos = np.unique(vidx.astype(np.int64), return_index=True)
        np.testing.assert_array_equal(np.sort(vox), np.sort(ids[want_pos]))
        assert len(vox) < len(keep)  # collisions actually happened

    def test_boundary_points_f32_division(self):
        # grid-aligned coords sit exactly on voxel boundaries in f32 but not
        # f64 (e.g. f32(0.1)/0.02): the native ids must match f32 arithmetic
        coords = RNG.integers(0, 100, size=(1500, 3)).astype(np.float32) * 0.02
        coords = np.concatenate([coords, coords[:300]])
        res = 0.02
        cmin = coords.min(0)
        nvox = np.ceil((coords.max(0) - cmin) / res)
        out = native.dedup_voxelize(coords, res, cmin, nvox)
        assert out is not None
        keep, vox = out
        ids = native.coord_first_occurrence(coords)
        np.testing.assert_array_equal(keep, ids)
        vidx = np.ceil((coords[ids] - cmin) / res)
        vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
        _, want_pos = np.unique(vidx.astype(np.int64), return_index=True)
        np.testing.assert_array_equal(np.sort(vox), np.sort(ids[want_pos]))

    def test_f64_coords_return_none(self):
        coords = RNG.uniform(0, 2, size=(100, 3))
        assert (
            native.dedup_voxelize(coords, 0.5, coords.min(0), np.ones(3)) is None
        )
