"""Whole-scene sliding-window tiling for evaluation and visualization.

Behavioral parity with ScannetDatasetWholeScene.__getitem__
(lib/dataset.py:293-353): tile the scene's xy bounding box into
1.5m x 1.5m full-height columns, skip empty columns, sample `npoints` per
column with replacement, weights = labelweights[label] * mask.

Quirk 3 (SURVEY.md): the reference indexes the full-scene-length `mask` bool
array with chunk-local choice indices (dataset.py:334-337) — semantically
wrong; weights are unused by the eval metrics anyway (they only flow into
filter_points, eval.py:48-49). Here mask is all-true (every sampled point is
inside its column by construction), which is what the reference intended.
"""

from __future__ import annotations

import numpy as np

from pointnet2_scannet_tpu.config import DataConfig
from pointnet2_scannet_tpu.data.scene_store import SceneStore, assemble_features


class WholeSceneDataset:
    """Per scene: (nsubvol, npoints, 3+C) feature stack + labels + weights."""

    def __init__(
        self,
        store: SceneStore,
        cfg: DataConfig,
        *,
        seed: int = 0,
    ):
        self.store = store
        self.cfg = cfg
        self.seed = seed
        # epoch counter folded into the per-scene sampling stream: TRAINING
        # must re-draw the with-replacement column selections every epoch
        # (the reference's per-call np.random draws, lib/dataset.py:316-337
        # — WholeSceneSolver bumps this per epoch); eval/visualize leave it
        # at 0, keeping scene tilings deterministic and process-count-
        # invariant (tests/test_multihost.py report-equality)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __len__(self) -> int:
        return len(self.store)

    @property
    def input_channels(self) -> int:
        return self.cfg.input_channels

    def max_points(self) -> int:
        """Largest per-scene point count (for fixed-shape device buffers)."""
        return max(
            len(self.store.scenes[sid]) for sid in self.store.scene_ids
        )

    def estimate_columns(self) -> list[int]:
        """Cheap per-scene UPPER BOUND on the non-empty column count
        (nx * ny from the xy bounds, no tiling pass) — used by the evaluator
        to auto-size its device ring."""
        out = []
        L = self.cfg.chunk_size_xy
        for sid in self.store.scene_ids:
            xyz = self.store.scenes[sid][:, :3]
            lo = xyz.min(axis=0)
            hi = xyz.max(axis=0)
            nx = max(int(np.ceil((hi[0] - lo[0]) / L)), 1)
            ny = max(int(np.ceil((hi[1] - lo[1]) / L)), 1)
            out.append(nx * ny)
        return out

    def _tile_indices(self, index: int):
        """Shared tiler core: per-column resample indices into the scene.

        Returns (feats_all (N, 3+C) f32, sel (S, npoints) int64) where
        sel[s] are the with-replacement point indices of non-empty column s
        (reference order/semantics, lib/dataset.py:316-337).
        """
        cfg = self.cfg
        sid = self.store.scene_ids[index]
        scene = self.store.scenes[sid]
        mv = self.store.multiview.get(sid) if cfg.use_multiview else None
        feats_all = assemble_features(
            scene,
            mv,
            use_color=cfg.use_color,
            use_normal=cfg.use_normal,
            use_multiview=cfg.use_multiview,
        )

        coordmin = feats_all[:, :3].min(axis=0)
        coordmax = feats_all[:, :3].max(axis=0)
        L = cfg.chunk_size_xy
        # clamp like estimate_columns: a zero x/y extent (planar degenerate
        # scene) must still yield one column, not an empty np.stack
        nx = max(int(np.ceil((coordmax[0] - coordmin[0]) / L)), 1)
        ny = max(int(np.ceil((coordmax[1] - coordmin[1]) / L)), 1)

        # column membership in ONE binned O(N) pass (native, numpy fallback)
        # instead of the reference's nx*ny full-scene mask scans — identical
        # membership/ordering semantics incl. the +-0.01 border overlap
        # (lib/dataset.py:316-337)
        from pointnet2_scannet_tpu.utils import native

        counts, members = native.tile_columns(
            feats_all[:, :3],
            coordmin,
            float(np.float32(coordmax[2] - coordmin[2])),
            float(L),
            0.01,
            nx,
            ny,
        )
        counts_flat = counts.reshape(-1)
        offsets = np.concatenate([[0], np.cumsum(counts_flat)])

        # per-SCENE deterministic stream (seed x epoch x scene id), not one
        # dataset stream consumed in iteration order: a scene's resample
        # draws are then independent of which scenes sit around it, so
        # repeated get_scene calls are idempotent within an epoch and a
        # multi-host eval shard reproduces the single-process tiling exactly
        # (tests/test_multihost.py asserts report equality)
        import zlib

        rng = np.random.default_rng(
            (self.seed, self.epoch, zlib.crc32(sid.encode()))
        )
        sels = []
        for col in range(nx * ny):
            cnt = counts_flat[col]
            if cnt == 0:
                continue
            idx = members[offsets[col] : offsets[col] + cnt]
            choice = rng.integers(0, cnt, size=cfg.npoints)
            sels.append(idx[choice])
        return feats_all, np.stack(sels)

    def get_scene(self, index: int):
        """Tile one scene.

        Returns:
          feats (S, npoints, 3+C), labels (S, npoints) int32,
          weights (S, npoints) float32 — S = number of non-empty columns.
        """
        sid = self.store.scene_ids[index]
        feats_all, sel = self._tile_indices(index)
        labels_all = self.store.scenes[sid][:, 10].astype(np.int32)
        lab = labels_all[sel]
        return (
            feats_all[sel].astype(np.float32),
            lab,
            self.store.label_weights[lab].astype(np.float32),
        )

    def get_scene_indexed(self, index: int):
        """Tile one scene WITHOUT materializing per-column feature copies.

        Returns (feats_all (N, 3+C) f32, col_idx (S, npoints) int32,
        labels (S, npoints) int32, weights (S, npoints) f32). Identical RNG
        draws to get_scene, so feats_all[col_idx] == get_scene()[0] for a
        same-seeded dataset. Used by the evaluator's index-streaming mode:
        the scene ships to the device ONCE and only the int32 resample
        indices ride per batch (~2x less host->device traffic).
        """
        sid = self.store.scene_ids[index]
        feats_all, sel = self._tile_indices(index)
        labels_all = self.store.scenes[sid][:, 10].astype(np.int32)
        lab = labels_all[sel]
        return (
            feats_all.astype(np.float32),
            sel.astype(np.int32),
            lab,
            self.store.label_weights[lab].astype(np.float32),
        )

    def iter_scenes(self):
        for i in range(len(self)):
            yield self.store.scene_ids[i], self.get_scene(i)

    def iter_scenes_indexed(self):
        for i in range(len(self)):
            yield self.store.scene_ids[i], self.get_scene_indexed(i)
