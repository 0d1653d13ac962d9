"""Per-epoch chunk sampling and training-time augmentation.

Behavioral parity with ScannetDataset (lib/dataset.py:14-252):
  - generate_chunks (dataset.py:204-252): per scene, up to 5 attempts to draw
    a 1.5m x 1.5m x full-height column centered on a random point; valid if
    >= 70% of its points have label > 0 AND >= 2% of a 31x31x62 voxelization
    of the in-bounds points is occupied; the LAST attempt is kept even if
    invalid; random-choice (with replacement) resample to npoints.
    Note `label > 0` counts class 0 ('floor') as unannotated — a reference
    quirk kept for parity (SURVEY.md quirk 8).
  - augmentation (dataset.py:99-202): center the chunk, then one of 8
    equally-likely cases: {none, T, R, S, TR, TS, RS, TRS} with translation
    U(-0.5, 0.5) m per axis, per-axis rotations U(-5, 5) degrees (the
    reference multiplies by 3.14/180, replicated behind `pi_3_14`), scale
    U(0.95, 1.05); then un-center.
  - per-point weights: labelweights[label] * in-bbox mask (a no-op mask in
    the reference, since the bbox is computed from the chunk itself —
    dataset.py:86-90, quirk 2 — replicated).
"""

from __future__ import annotations

import numpy as np

from pointnet2_scannet_tpu.config import DataConfig
from pointnet2_scannet_tpu.data.scene_store import SceneStore, assemble_features


def _rotation_matrix(rng: np.random.Generator, pi: float) -> np.ndarray:
    tx, ty, tz = rng.uniform(-5.0, 5.0, size=3) * pi / 180.0
    cx, sx = np.cos(tx), np.sin(tx)
    cy, sy = np.cos(ty), np.sin(ty)
    cz, sz = np.cos(tz), np.sin(tz)
    rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rz @ ry @ rx


def draw_augment_params(
    rng: np.random.Generator, *, pi_3_14: bool = True
) -> tuple[np.ndarray | None, np.ndarray | None, float | None]:
    """Draw one chunk's (rotation, translation, scale) with the reference's
    8-way case split (lib/dataset.py:104-138). Inactive transforms return
    None. The draw ORDER (case, then t, then R's three angles, then s)
    matches augment_coords' historical stream, so a resident-store loader
    consuming params directly reproduces the host path's rng sequence."""
    pi = 3.14 if pi_3_14 else float(np.pi)
    case = rng.integers(0, 8)
    do_t = case in (1, 4, 5, 7)
    do_r = case in (2, 4, 6, 7)
    do_s = case in (3, 5, 6, 7)
    t = rng.uniform(-0.5, 0.5, size=3) if do_t else None
    rot = _rotation_matrix(rng, pi) if do_r else None
    s = float(rng.uniform(0.95, 1.05)) if do_s else None
    return rot, t, s


def augment_coords(
    coords: np.ndarray, rng: np.random.Generator, *, pi_3_14: bool = True
) -> np.ndarray:
    """Randomly translate/rotate/scale chunk coordinates about their centroid
    with the reference's 8-way case split (lib/dataset.py:104-138)."""
    center = coords.mean(axis=0)
    out = coords - center
    rot, t, s = draw_augment_params(rng, pi_3_14=pi_3_14)
    if t is not None:
        out = out + t
    if rot is not None:
        out = (rot @ out.T).T
    if s is not None:
        out = out * s
    return (out + center).astype(np.float32)


class ChunkedSceneDataset:
    """One training chunk per scene per epoch, resampled each epoch."""

    def __init__(
        self,
        store: SceneStore,
        cfg: DataConfig,
        *,
        phase: str = "train",
        seed: int = 0,
        resident: bool = False,
    ):
        assert phase in ("train", "val", "test")
        self.store = store
        self.cfg = cfg
        self.phase = phase
        self.rng = np.random.default_rng(seed)
        # separate stream for chunk generation so the async regen thread
        # never races the main thread's augmentation draws
        self.chunk_rng = np.random.default_rng(seed + 0x5EED)
        # resident mode (Solver device_store): chunk regen keeps ROW INDICES
        # into the device-resident flat scene store instead of materializing
        # feature arrays — get_item_resident then ships (rows, aug params)
        # and the gather + augmentation run inside the jitted step. Both
        # modes draw from identical rng streams, so a host-mode dataset at
        # the same seed produces the same chunks/augmentations (tested:
        # tests/test_resident.py).
        self.resident = resident
        self._offsets: dict[str, int] | None = None
        # scene_id -> (chunk (n, 11), multiview (n, 128) | None), or
        # scene_id -> scene-local resampled rows (npoints,) in resident mode
        self.chunks: dict[str, tuple[np.ndarray, np.ndarray | None]] = {}
        self._next: dict[str, tuple[np.ndarray, np.ndarray | None]] | None = None
        self._regen_thread = None

    def __len__(self) -> int:
        return len(self.store)

    @property
    def input_channels(self) -> int:
        return self.cfg.input_channels

    def generate_chunks(self) -> None:
        """Resample one fixed-size chunk per scene (lib/dataset.py:204-252).

        If an async regeneration (start_regen_async) is pending, swaps in its
        result instead of recomputing — the per-epoch host chunking then fully
        overlaps the previous epoch's device compute.
        """
        if self._regen_thread is not None:
            self._regen_thread.join()
            self._regen_thread = None
            if self._next is not None:
                self.chunks = self._next
                self._next = None
                return
        self.chunks = self._generate()

    def start_regen_async(self) -> None:
        """Kick off next epoch's chunk resampling on a background thread."""
        import threading

        if self._regen_thread is not None:
            return

        def work():
            self._next = self._generate()

        self._regen_thread = threading.Thread(target=work, daemon=True)
        self._regen_thread.start()

    def _generate(self) -> dict:
        cfg = self.cfg
        out: dict[str, tuple[np.ndarray, np.ndarray | None]] = {}
        half_xy = cfg.chunk_size_xy / 2.0
        for sid in self.store.scene_ids:
            scene = self.store.scenes[sid]
            semantic = scene[:, 10].astype(np.int32)
            mv = self.store.multiview.get(sid) if cfg.use_multiview else None
            coordmin = scene[:, :3].min(axis=0)
            coordmax = scene[:, :3].max(axis=0)

            from pointnet2_scannet_tpu.utils import native

            xyz32 = np.ascontiguousarray(scene[:, :3], np.float32)
            cur = None
            cur_rows = None
            for _ in range(cfg.chunk_retries):
                center = scene[self.chunk_rng.integers(len(scene)), :3]
                curmin = (center - [half_xy, half_xy, 1.5]).astype(np.float32)
                curmax = (center + [half_xy, half_xy, 1.5]).astype(np.float32)
                curmin[2], curmax[2] = coordmin[2], coordmax[2]
                # fused crop + validity scan (native when built): annotated
                # fraction + 31x31x62 voxel occupancy (dataset.py:219-240)
                inside, n_annotated, n_occupied = native.chunk_scan(
                    xyz32, semantic, curmin, curmax, cfg.chunk_margin
                )
                if self.resident:
                    # rows only — no feature materialization; flatnonzero's
                    # ascending order matches scene[inside]'s row order, so
                    # the resample `choice` below selects identical points
                    cur_rows = np.flatnonzero(inside)
                    n_inside = len(cur_rows)
                else:
                    cur = (scene[inside], mv[inside] if mv is not None else None)
                    n_inside = len(cur[0])
                if n_inside == 0:
                    continue
                annotated = n_annotated / n_inside
                occupancy = n_occupied / (31.0 * 31.0 * 62.0)
                if (
                    annotated >= cfg.min_annotated_frac
                    and occupancy >= cfg.min_voxel_occupancy
                ):
                    break

            if self.resident:
                choice = self.chunk_rng.integers(0, len(cur_rows), size=cfg.npoints)
                out[sid] = cur_rows[choice]
                continue
            chunk, chunk_mv = cur
            choice = self.chunk_rng.integers(0, len(chunk), size=cfg.npoints)
            out[sid] = (
                chunk[choice],
                chunk_mv[choice] if chunk_mv is not None else None,
            )
        return out

    def scene_offsets(self) -> dict[str, int]:
        """Scene start rows in the flattened (scene_ids-order) store — the
        global row space of data.resident.flatten_store."""
        if self._offsets is None:
            offs, o = {}, 0
            for sid in self.store.scene_ids:
                offs[sid] = o
                o += len(self.store.scenes[sid])
            self._offsets = offs
        return self._offsets

    @property
    def augmenting(self) -> bool:
        return self.phase == "train" and self.cfg.augment

    def get_item_resident(
        self, index: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, float]:
        """One resident-mode sample: (global store rows (npoints,) int32,
        rotation (3, 3) f32, translation (3,) f32, scale f32).

        Draws from the same rng stream, at the same call sites, as
        get_item's host path — identity params stand in for inactive
        transforms (t=0, R=I, s=1 compose to the same coords)."""
        sid = self.store.scene_ids[index]
        if sid not in self.chunks:
            raise RuntimeError("call generate_chunks() before sampling items")
        rows = self.chunks[sid]
        if self.augmenting:
            rot, t, s = draw_augment_params(self.rng)
        else:
            rot, t, s = None, None, None
        return (
            (self.scene_offsets()[sid] + rows).astype(np.int32),
            np.eye(3, dtype=np.float32) if rot is None else rot.astype(np.float32),
            np.zeros(3, np.float32) if t is None else t.astype(np.float32),
            np.float32(1.0) if s is None else np.float32(s),
        )

    def get_item(self, index: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One sample: (features (npoints, 3+C), labels (npoints,),
        weights (npoints,)) — lib/dataset.py:61-94."""
        sid = self.store.scene_ids[index]
        if sid not in self.chunks:
            raise RuntimeError("call generate_chunks() before sampling items")
        if self.resident:
            raise RuntimeError(
                "dataset is in resident mode (row indices, no materialized "
                "chunks) — use get_item_resident"
            )
        chunk, mv = self.chunks[sid]
        cfg = self.cfg
        feats = assemble_features(
            chunk,
            mv,
            use_color=cfg.use_color,
            use_normal=cfg.use_normal,
            use_multiview=cfg.use_multiview,
        )
        if self.phase == "train" and cfg.augment:
            feats[:, :3] = augment_coords(feats[:, :3], self.rng)
        labels = chunk[:, 10].astype(np.int32)
        # in-bbox mask over the chunk's own bbox — always true (quirk 2)
        lo = feats[:, :3].min(axis=0) - 0.01
        hi = feats[:, :3].max(axis=0) + 0.01
        mask = np.all((feats[:, :3] >= lo) & (feats[:, :3] <= hi), axis=1)
        weights = (self.store.label_weights[labels] * mask).astype(np.float32)
        return feats, labels, weights
