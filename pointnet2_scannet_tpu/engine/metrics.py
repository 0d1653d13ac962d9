"""Segmentation metrics.

Two tiers:
  1. Host "parity" metrics — exact re-implementations (vectorized) of the
     reference metric library (scripts/eval.py:40-124): coordinate dedup,
     point accuracy, per-class point/voxel accuracy, calibrated voxel
     accuracy, point/voxel per-class IoU over 0.02m surface voxels with
     representative-point voxel labels. Used at eval cadence.
  2. On-device confusion-matrix accumulation — computed inside the jitted
     train step so training never syncs device->host per iteration (the
     reference's biggest throughput bug: a full .cpu() + numpy voxelization
     EVERY training iteration, lib/solver.py:327-347). Per-iteration device
     metrics skip the coordinate dedup (train chunks rarely duplicate
     coords; the reference dedup is a no-op there too unless the resampler
     duplicated points).

Dedup note: the reference dedups by python string-hash of the printed coords
(eval.py:42-44); here we dedup by exact row equality, which is the same set
minus hash collisions, with the same first-occurrence-wins selection. The
ORDER of the deduped points differs (ours: ascending original index; the
reference's: ascending string hash — which is PYTHONHASHSEED-dependent, so
its voxel representative points, and hence its voxel metrics, vary run to
run in the 4th decimal). Ours is deterministic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pointnet2_scannet_tpu.config import NUM_CLASSES
from pointnet2_scannet_tpu.utils.voxel import surface_voxel_labels


def pred_transfer_dtype(num_classes: int):
    """Narrowest integer dtype that holds a class id.

    Shared by the evaluator and the AOT export path so the device->host
    transfer contract (argmax carried home at int8 when it fits) can never
    diverge between live eval and serving artifacts.
    """
    return jnp.int8 if num_classes <= 127 else jnp.int32


# ------------------------------ host tier ---------------------------------


def filter_points(coords, preds, targets, weights):
    """Keep the first occurrence of every unique coordinate (eval.py:40-46).

    Uses the native O(N) hash dedup (cpp/hostops.cpp) when built, else a
    sort-based numpy unique; the selected index SET is identical.
    """
    from pointnet2_scannet_tpu.utils import native

    ids = native.coord_first_occurrence(np.asarray(coords, np.float32))
    return coords[ids], preds[ids], targets[ids], weights[ids]


def _per_class_counts(preds, targets, num_classes):
    # bincount == the np.add.at histogram, ~30x faster (add.at is unbuffered)
    seen = np.bincount(targets, minlength=num_classes).astype(np.int64)
    correct = np.bincount(
        targets[preds == targets], minlength=num_classes
    ).astype(np.int64)
    return seen, correct


def _dedup_and_voxelize(coords, preds, targets, weights, num_classes):
    """The shared (and expensive) front half of every scene metric: unique
    coordinates, seen classes, and the 0.02m voxel [target, pred] labels.

    Fast path: ONE native pass does both the coordinate dedup and the voxel
    first-occurrence (cpp/hostops.cpp dedup_voxelize); uvlabel comes back in
    first-encounter voxel order rather than key-sorted — every downstream
    formula (elementwise label compares + histograms) is order-invariant
    over voxels, parity-tested against the two-step path and the in-process
    reference functions.
    """
    from pointnet2_scannet_tpu.utils import native

    coords = np.asarray(coords, np.float32)
    res = 0.02
    coordmin = coords.min(axis=0) if len(coords) else np.zeros(3, np.float32)
    coordmax = coords.max(axis=0) if len(coords) else np.zeros(3, np.float32)
    nvox = np.ceil((coordmax - coordmin) / res)
    fused = native.dedup_voxelize(coords, res, coordmin, nvox)
    if fused is not None:
        keep_idx, vox_idx = fused
        # vox_idx are ORIGINAL row indices of each voxel's representative
        uvlabel = np.stack([targets[vox_idx], preds[vox_idx]], axis=1)
        preds, targets = preds[keep_idx], targets[keep_idx]
    else:
        coords, preds, targets, weights = filter_points(
            coords, preds, targets, weights
        )
        _, uvlabel, _ = surface_voxel_labels(
            coords, np.stack([targets, preds], axis=1), res=res
        )
    # == np.unique(targets) for in-range labels, without the O(N log N) sort
    seen_classes = np.flatnonzero(np.bincount(targets, minlength=num_classes))
    return preds, targets, seen_classes, uvlabel


def _acc_from(preds, targets, seen_classes, uvlabel, num_classes):
    mask = np.zeros(num_classes)
    mask[seen_classes] = 1

    pointacc = np.sum(preds == targets) / float(targets.shape[0])
    seen_pt, correct_pt = _per_class_counts(preds, targets, num_classes)

    voxacc = np.sum(uvlabel[:, 0] == uvlabel[:, 1]) / float(uvlabel.shape[0])
    seen_vox, correct_vox = _per_class_counts(uvlabel[:, 1], uvlabel[:, 0], num_classes)

    # calibrated: per-class voxel acc averaged with voxel label frequencies
    # (eval.py:88-91)
    caliweights = seen_vox.astype(np.float64)
    caliweights = caliweights / caliweights.sum()
    voxcaliacc = np.average(
        correct_vox / (seen_vox.astype(np.float64) + 1e-8), weights=caliweights
    )

    pointacc_per_class = np.zeros(num_classes)
    voxacc_per_class = np.zeros(num_classes)
    for c in seen_classes:
        pointacc_per_class[c] = correct_pt[c] / (seen_pt[c] + 1e-8)
        voxacc_per_class[c] = correct_vox[c] / (seen_vox[c] + 1e-8)

    return pointacc, pointacc_per_class, voxacc, voxacc_per_class, voxcaliacc, mask


def _miou_from(preds, targets, seen_classes, uvlabel, num_classes):
    mask = np.zeros(num_classes)
    mask[seen_classes] = 1

    def iou(p, t):
        # confusion-matrix form of the reference's per-class loop
        # (eval.py:101-124): inter = cm[c,c], union = row + col - diag —
        # identical sums, one bincount instead of ~6 passes per class
        cm = np.bincount(
            t * num_classes + p, minlength=num_classes * num_classes
        ).reshape(num_classes, num_classes)
        inter = np.diag(cm).astype(np.float64)
        union = cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm)
        out = np.zeros(num_classes)
        out[seen_classes] = inter[seen_classes] / (union[seen_classes] + 1e-8)
        return out

    return iou(preds, targets), iou(uvlabel[:, 1], uvlabel[:, 0]), mask


def compute_acc(coords, preds, targets, weights, num_classes: int = NUM_CLASSES):
    """Point/voxel/calibrated accuracies (parity with eval.py:48-99).

    Returns:
      (pointacc, pointacc_per_class, voxacc, voxacc_per_class, voxcaliacc,
       seen_mask) — per-class arrays are zero for unseen classes and the mask
      marks classes present in the targets.
    """
    preds, targets, seen_classes, uvlabel = _dedup_and_voxelize(
        coords, preds, targets, weights, num_classes
    )
    return _acc_from(preds, targets, seen_classes, uvlabel, num_classes)


def compute_miou(coords, preds, targets, weights, num_classes: int = NUM_CLASSES):
    """Point and voxel per-class IoU (parity with eval.py:101-124).

    Returns (pointmiou, voxmiou, seen_mask) with zeros for unseen classes.
    """
    preds, targets, seen_classes, uvlabel = _dedup_and_voxelize(
        coords, preds, targets, weights, num_classes
    )
    return _miou_from(preds, targets, seen_classes, uvlabel, num_classes)


def compute_scene_metrics(
    coords, preds, targets, weights, num_classes: int = NUM_CLASSES
):
    """compute_acc + compute_miou sharing ONE dedup + voxelization.

    The two reference functions (eval.py:48-99, 101-124) each redo the
    coordinate dedup and the 0.02m voxelization on identical inputs — the
    expensive half of per-scene metrics (which are a SERIAL cost on
    single-core eval hosts; the evaluator's metric pool can only hide them
    when cores are free). Returns (acc_tuple, miou_tuple), each exactly
    what the corresponding standalone function returns (parity-tested).
    """
    preds, targets, seen_classes, uvlabel = _dedup_and_voxelize(
        coords, preds, targets, weights, num_classes
    )
    return (
        _acc_from(preds, targets, seen_classes, uvlabel, num_classes),
        _miou_from(preds, targets, seen_classes, uvlabel, num_classes),
    )


# ----------------------------- device tier ---------------------------------


def confusion_matrix(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    num_classes: int = NUM_CLASSES,
    row_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(num_classes, num_classes) confusion counts, rows = target class.

    Pure jnp — runs inside jit; across data-parallel shards the result is
    summed by the partitioner (it's a plain array output). `row_mask` (B,)
    excludes padded batch rows from the counts.
    """
    # scatter-free binning: XLA's TPU scatter serializes on non-unique
    # indices (hundreds of thousands of sequential updates). As one-hot
    # matmuls the count lands on the MXU: cm[i,j] = sum_p 1[l_p=i] 1[p_p=j].
    flat_l = labels.reshape(-1)
    flat_p = preds.reshape(-1)
    classes = jnp.arange(num_classes, dtype=flat_l.dtype)
    oh_l = (flat_l[:, None] == classes[None, :]).astype(jnp.float32)
    oh_p = (flat_p[:, None] == classes[None, :]).astype(jnp.float32)
    if row_mask is not None:
        inc = jnp.broadcast_to(row_mask[:, None], labels.shape).reshape(-1)
        oh_l = oh_l * inc[:, None]
    cm = jnp.einsum("pi,pj->ij", oh_l, oh_p, preferred_element_type=jnp.float32)
    return jnp.round(cm).astype(jnp.int32)


def instance_part_miou(
    preds: np.ndarray,
    labels: np.ndarray,
    category: np.ndarray,
    offsets: np.ndarray,
    sizes: np.ndarray,
) -> tuple[float, dict[int, list[float]]]:
    """ShapeNet-part-style instance-average mIoU.

    preds/labels: (B, N) int GLOBAL part ids; category: (B,) int; the parts
    of category c occupy global ids [offsets[c], offsets[c] + sizes[c]).
    Per shape: IoU of each of ITS category's parts (a part absent from both
    gt and pred counts as IoU 1, the standard convention), averaged over the
    category's parts. Returns (mean over shapes, per-category LIST of
    per-shape IoUs) — the lists let callers aggregate across batches with
    per-shape weighting (the ShapeNet definition), not per-batch means.
    Predictions are the UNRESTRICTED global argmax — a pred outside the
    shape's part block counts against every part's union via its gt point
    (slightly stricter than category-masked-argmax protocols).
    """
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    category = np.asarray(category)
    shape_ious: list[float] = []
    per_cat: dict[int, list[float]] = {}
    for i in range(preds.shape[0]):
        c = int(category[i])
        lo = int(offsets[c])
        part_ious = []
        for p in range(lo, lo + int(sizes[c])):
            gt = labels[i] == p
            pd = preds[i] == p
            union = np.logical_or(gt, pd).sum()
            part_ious.append(
                1.0 if union == 0 else float(np.logical_and(gt, pd).sum() / union)
            )
        iou = float(np.mean(part_ious))
        shape_ious.append(iou)
        per_cat.setdefault(c, []).append(iou)
    mean = float(np.mean(shape_ious)) if shape_ious else 0.0
    return mean, per_cat


def confusion_to_point_metrics(cm: np.ndarray) -> dict[str, float]:
    """Point accuracy / per-class accuracy / mIoU from a confusion matrix,
    masked-averaged over seen classes like the solver reports
    (lib/solver.py:339-346)."""
    cm = np.asarray(cm, np.float64)
    seen = cm.sum(axis=1)
    mask = seen > 0
    tp = np.diag(cm)
    acc = tp.sum() / max(cm.sum(), 1.0)
    per_class = np.where(mask, tp / np.maximum(seen, 1.0), 0.0)
    union = seen + cm.sum(axis=0) - tp
    iou = np.where(mask, tp / np.maximum(union, 1.0), 0.0)
    denom = max(mask.sum(), 1)
    return {
        "point_acc": float(acc),
        "point_acc_per_class": float(per_class.sum() / denom),
        "point_miou": float(iou.sum() / denom),
    }
