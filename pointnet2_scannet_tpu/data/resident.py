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
    if total >= 2**31:
        # descriptor rows are int32 (get_item_resident); past 2^31 the
        # offsets wrap negative and jnp.take's clip mode would silently
        # gather wrong rows instead of erroring
        raise ValueError(
            f"flattened store has {total} rows >= 2^31; int32 descriptor "
            "indices would overflow — device_store cannot hold this dataset"
        )
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


def _finish_batch(store: dict, batch: dict, pts, labels) -> dict:
    """Shared tail of batch materialization: apply the per-chunk augmentation
    transform when params ride along, and look weights up from the
    class-weight table (the host path's in-bbox mask is identically 1 —
    lib/dataset.py:86-90, SURVEY quirk 2 — so weights = wtable[labels]
    exactly). Transform order matches chunks.augment_coords: center, +t,
    rotate, *s, uncenter."""
    import jax.numpy as jnp

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


def materialize_batch(store: dict, batch: dict) -> dict:
    """Device-side batch assembly (runs inside the jitted train step):
    gather points/labels from the flat (replicated) store, then augment +
    weight-lookup.

    store: {"points" (T, 3+C) f32, "labels" (T,) i32, "wtable" (K,) f32}."""
    import jax.numpy as jnp

    idx = batch["idx"]
    pts = jnp.take(store["points"], idx, axis=0)  # (B, NP, 3+C)
    labels = jnp.take(store["labels"], idx, axis=0)  # (B, NP)
    return _finish_batch(store, batch, pts, labels)


def pad_store_rows(
    pts: np.ndarray, labels: np.ndarray, n_shards: int
) -> tuple[np.ndarray, np.ndarray]:
    """Zero-pad the flat store to a row count divisible by `n_shards` (the
    dp-sharded placement splits rows evenly; descriptors only ever reference
    real rows, so the pad rows are dead weight on the last shard)."""
    total = pts.shape[0]
    pad = -total % n_shards
    if pad:
        pts = np.concatenate([pts, np.zeros((pad,) + pts.shape[1:], pts.dtype)])
        labels = np.concatenate([labels, np.zeros(pad, labels.dtype)])
    return pts, labels


def materialize_batch_sharded(store: dict, batch: dict, axis_name: str) -> dict:
    """Per-device shard_map body for a ROW-SHARDED store: HBM capacity scales
    with the mesh (T/dp rows per device) instead of replicating the full
    store, unlocking device_store for recipes whose flat store exceeds one
    chip's budget (the 131-channel multiview store is ~63 GB at
    1201 x 100k x 131 — VERDICT r4 weak #2).

    store holds THIS DEVICE's row block ("points" (T/dp, 3+C), "labels"
    (T/dp,)) plus the replicated "wtable"; batch is this device's descriptor
    shard with GLOBAL row ids. Global id -> (owner, local row) is a
    static-shape divmod by the block size; each device gathers the rows it
    owns for EVERY device's requests (all_gather of the small index block),
    and one psum_scatter over ICI returns exactly this device's materialized
    (B/dp, NP, 3+C) shard — the tiled all_gather/psum_scatter pair keeps
    block d of the batch on device d, so the result aligns with this shard's
    own augmentation params. Cross-device traffic per step is the gathered
    feature block itself (~B x NP x C floats), which replaces the same bytes
    of host->device traffic the replicated path would re-upload as features;
    index traffic is B x NP i32."""
    import jax.numpy as jnp
    from jax import lax

    idx = batch["idx"]  # (B_loc, NP) global store rows
    t_loc = store["points"].shape[0]
    me = lax.axis_index(axis_name)
    idx_all = lax.all_gather(idx, axis_name, axis=0, tiled=True)  # (B, NP)
    owner = idx_all // t_loc
    local = idx_all % t_loc
    mine = owner == me
    pts_c = jnp.where(
        mine[..., None], jnp.take(store["points"], local, axis=0), 0.0
    )
    lab_c = jnp.where(mine, jnp.take(store["labels"], local, axis=0), 0)
    pts = lax.psum_scatter(pts_c, axis_name, scatter_dimension=0, tiled=True)
    labels = lax.psum_scatter(lab_c, axis_name, scatter_dimension=0, tiled=True)
    return _finish_batch(store, batch, pts, labels)
