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
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.store)

    @property
    def input_channels(self) -> int:
        return self.cfg.input_channels

    def get_scene(self, index: int):
        """Tile one scene.

        Returns:
          feats (S, npoints, 3+C), labels (S, npoints) int32,
          weights (S, npoints) float32 — S = number of non-empty columns.
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
        labels_all = scene[:, 10].astype(np.int32)

        coordmin = feats_all[:, :3].min(axis=0)
        coordmax = feats_all[:, :3].max(axis=0)
        L = cfg.chunk_size_xy
        nx = int(np.ceil((coordmax[0] - coordmin[0]) / L))
        ny = int(np.ceil((coordmax[1] - coordmin[1]) / L))

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

        f_out, l_out, w_out = [], [], []
        for col in range(nx * ny):
            cnt = counts_flat[col]
            if cnt == 0:
                continue
            idx = members[offsets[col] : offsets[col] + cnt]
            choice = self.rng.integers(0, cnt, size=cfg.npoints)
            sel = idx[choice]
            f_out.append(feats_all[sel])
            lab = labels_all[sel]
            l_out.append(lab)
            w_out.append(self.store.label_weights[lab])
        return (
            np.stack(f_out).astype(np.float32),
            np.stack(l_out).astype(np.int32),
            np.stack(w_out).astype(np.float32),
        )

    def iter_scenes(self):
        for i in range(len(self)):
            yield self.store.scene_ids[i], self.get_scene(i)
