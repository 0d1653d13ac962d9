"""Batching and host->device prefetch.

Replaces the reference's torch DataLoader + prefetch_generator background
thread (lib/dataset.py:60, scripts/train.py:20-28) with a plain-numpy batch
assembler and a double-buffered device prefetcher: while the device runs step
t, the host assembles and transfers batch t+1.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

import jax
import numpy as np

from pointnet2_scannet_tpu.data.chunks import ChunkedSceneDataset


class BatchLoader:
    """Assembles fixed-shape (B, npoints, 3+C) batches from a chunk dataset.

    Iterates scenes in fixed order like the reference DataLoader (which is
    created without shuffle, scripts/train.py:26); set shuffle=True to
    randomize scene order per epoch. The trailing partial batch is kept
    (the reference does the same).
    """

    def __init__(
        self,
        dataset: ChunkedSceneDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        seed: int = 0,
    ):
        if drop_last and pad_last:
            raise ValueError("drop_last and pad_last are mutually exclusive")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad_last = pad_last
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        full, rem = divmod(n, self.batch_size)
        if self.drop_last or rem == 0:
            return full
        return full + 1

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        """Yields fixed-key batches; `row_mask` (B,) float32 marks real rows
        (zeros are padding added by pad_last so every batch keeps the one
        compiled shape — ragged trailing batches would retrace XLA)."""
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.batch_size):
            idxs = order[start : start + self.batch_size]
            if len(idxs) < self.batch_size and self.drop_last:
                return
            feats, labels, weights = (
                list(x) for x in zip(*(self.dataset.get_item(int(i)) for i in idxs))
            )
            real = len(idxs)
            if real < self.batch_size:
                if not self.pad_last:
                    # ragged final batch (single-device / host use only)
                    yield {
                        "points": np.stack(feats),
                        "labels": np.stack(labels),
                        "weights": np.stack(weights),
                        "row_mask": np.ones(real, np.float32),
                    }
                    return
                for _ in range(self.batch_size - real):
                    feats.append(np.zeros_like(feats[0]))
                    labels.append(np.zeros_like(labels[0]))
                    weights.append(np.zeros_like(weights[0]))
            row_mask = np.zeros(self.batch_size, np.float32)
            row_mask[:real] = 1.0
            yield {
                "points": np.stack(feats),
                "labels": np.stack(labels),
                "weights": np.stack(weights),
                "row_mask": row_mask,
            }


def prefetch_to_device(
    iterator, *, size: int = 2, sharding: jax.sharding.Sharding | None = None,
    place=None,
):
    """Background-thread prefetch + device_put (double buffering by default).

    Overlaps host batch assembly and the H2D copy with device compute — the
    TPU-side equivalent of the reference's @background() prefetch thread.
    When `sharding` is given, batches are placed directly into their
    data-parallel layout (one H2D copy per device shard, no host round trip).
    `sharding` may also be a callable item -> sharding for streams that mix
    layouts (e.g. fused (K, B, ...) groups + per-batch leftovers).

    `place` (item -> placed item) overrides the device_put entirely — the
    hook multi-process runs use to assemble GLOBAL batches from each
    process's local rows (ProcessContext.place); whatever it returns is
    yielded as-is, so it may also pair the host copy with the placed one.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error: list[BaseException] = []

    def producer():
        try:
            for item in iterator:
                if place is not None:
                    item = place(item)
                else:
                    s = sharding(item) if callable(sharding) else sharding
                    if s is not None:
                        item = jax.device_put(item, s)
                    else:
                        item = jax.device_put(item)
                q.put(item)
        except BaseException as e:  # noqa: BLE001 - re-raised in the consumer
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
