"""Device-resident scene store: the training-side descriptor dispatch.

The production-scale rehearsal (DESIGN.md §host-pipeline rehearsal) measured
the chunked train recipe host-bound on a slow link: per-step H2D traffic is
the full assembled batch (B=32 x 8192 x 9 f32 = 9.4 MB, ~340 MB/epoch at
1201 scenes) plus a host collate pass per batch — while device compute is
~46 ms/step. The whole-scene EVALUATOR already solved this shape of problem
(engine/evaluator.py descriptor dispatch); this module is the train-side
equivalent:

  - every scene's assembled features + labels upload ONCE into a flat
    (T, 3+C) device array (flatten_store);
  - per-epoch chunk regen keeps scene-local ROW INDICES (no feature
    materialization, ChunkedSceneDataset(resident=True));
  - per-step host traffic is (B, npoints) int32 rows + per-chunk
    augmentation params (~1 MB vs 9.4 MB at the flagship config);
  - the gather, the 8-way augmentation transform, and the class-weight
    lookup run INSIDE the jitted train step (materialize_batch), fused by
    XLA with the first SA layer's consumers.

The reference has no analog (its DataLoader re-collates and re-uploads full
feature batches every step, lib/dataset.py:61-94 + scripts/train.py:26);
semantics are pinned to the host path: identical rng streams (chunk AND
augmentation draws), bit-identical batches with augmentation off, and
f32-tolerance coords with it on (host applies the rotation in f64 numpy,
the device in f32) — tests/test_resident.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pointnet2_scannet_tpu.config import DataConfig
from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset
from pointnet2_scannet_tpu.data.scene_store import SceneStore, assemble_features


def store_nbytes(store: SceneStore, cfg: DataConfig) -> int:
    """HBM bytes of the flattened store (features f32 + labels i32)."""
    total = sum(len(store.scenes[sid]) for sid in store.scene_ids)
    return total * ((3 + cfg.input_channels) * 4 + 4)


def flatten_store(
    store: SceneStore, cfg: DataConfig
) -> tuple[np.ndarray, np.ndarray]:
    """All scenes assembled + concatenated in scene_ids order:
    (points (T, 3+C) f32, labels (T,) int32). Row spaces match
    ChunkedSceneDataset.scene_offsets()."""
    counts = [len(store.scenes[sid]) for sid in store.scene_ids]
    total = sum(counts)
    pts = np.empty((total, 3 + cfg.input_channels), np.float32)
    labels = np.empty(total, np.int32)
    o = 0
    for sid, n in zip(store.scene_ids, counts):
        scene = store.scenes[sid]
        mv = store.multiview.get(sid) if cfg.use_multiview else None
        pts[o : o + n] = assemble_features(
            scene,
            mv,
            use_color=cfg.use_color,
            use_normal=cfg.use_normal,
            use_multiview=cfg.use_multiview,
        )
        labels[o : o + n] = scene[:, 10].astype(np.int32)
        o += n
    return pts, labels


class ResidentBatchLoader:
    """Assembles resident-mode batches: {"idx" (B, npoints) i32 global store
    rows, "row_mask" (B,), and — when the dataset augments — "rot" (B, 3, 3),
    "trans" (B, 3), "scale" (B,)}. Augmentation keys are OMITTED entirely
    when off so materialize_batch skips the transform and the gathered
    coords stay bit-identical to the host path.

    Train-only (drop_last semantics, matching the Solver's train loader);
    scene order/shuffle matches BatchLoader at the same seed."""

    def __init__(
        self,
        dataset: ChunkedSceneDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
    ):
        if not dataset.resident:
            raise ValueError("ResidentBatchLoader needs a resident-mode dataset")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_full = len(order) // self.batch_size * self.batch_size
        for start in range(0, n_full, self.batch_size):
            items = [
                self.dataset.get_item_resident(int(i))
                for i in order[start : start + self.batch_size]
            ]
            idx, rot, trans, scale = (np.stack(c) for c in zip(*items))
            batch = {
                "idx": idx,
                "row_mask": np.ones(self.batch_size, np.float32),
            }
            if self.dataset.augmenting:
                batch.update(rot=rot, trans=trans, scale=scale)
            yield batch


def materialize_batch(store: dict, batch: dict) -> dict:
    """Device-side batch assembly (runs inside the jitted train step):
    gather points/labels from the flat store, apply the per-chunk
    augmentation transform when params ride along, and look weights up from
    the class-weight table (the host path's in-bbox mask is identically 1 —
    lib/dataset.py:86-90, SURVEY quirk 2 — so weights = wtable[labels]
    exactly).

    store: {"points" (T, 3+C) f32, "labels" (T,) i32, "wtable" (K,) f32}.
    Transform order matches chunks.augment_coords: center, +t, rotate,
    *s, uncenter."""
    import jax.numpy as jnp

    idx = batch["idx"]
    pts = jnp.take(store["points"], idx, axis=0)  # (B, NP, 3+C)
    labels = jnp.take(store["labels"], idx, axis=0)  # (B, NP)
    if "rot" in batch:
        xyz = pts[..., :3]
        center = jnp.mean(xyz, axis=1, keepdims=True)
        out = xyz - center + batch["trans"][:, None, :]
        # out @ R^T per sample == the host's (R @ out.T).T
        out = jnp.einsum("bnc,bdc->bnd", out, batch["rot"])
        out = out * batch["scale"][:, None, None] + center
        pts = jnp.concatenate([out, pts[..., 3:]], axis=-1)
    weights = jnp.take(store["wtable"], labels, axis=0)
    return {
        "points": pts,
        "labels": labels,
        "weights": weights,
        "row_mask": batch["row_mask"],
    }
