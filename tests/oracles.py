"""Slow numpy oracles implementing the reference CUDA kernel contracts.

These are independent re-implementations of the documented semantics
(see the per-op docstrings in pointnet2_scannet_tpu/ops/) written as literal
index-order loops, used as golden references for the JAX/Pallas ops. The
reference itself is GPU-only (AT_ASSERT(false) on CPU), so parity is gated
against these contracts rather than recorded CUDA outputs.
"""

from __future__ import annotations

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int, skip_near_origin: bool = True) -> np.ndarray:
    """Furthest-point sampling per sampling_gpu.cu:69-173."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), np.int32)
    for b in range(B):
        pts = xyz[b].astype(np.float64)
        temp = np.full(N, 1e10)
        mag = np.sum(pts * pts, axis=1)
        old = 0
        out[b, 0] = 0
        for j in range(1, npoint):
            best, besti = -1.0, 0
            ref = pts[old]
            for k in range(N):
                if skip_near_origin and mag[k] <= 1e-3:
                    continue
                d = np.sum((pts[k] - ref) ** 2)
                d2 = min(d, temp[k])
                temp[k] = d2
                if d2 > best:
                    best, besti = d2, k
            old = besti
            out[b, j] = old
    return out


def ball_query_oracle(
    radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray
) -> np.ndarray:
    """Ball query per ball_query_gpu.cu:9-44."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    r2 = radius * radius
    for b in range(B):
        for j in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, j] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[b, j, :] = k
                    idx[b, j, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def three_nn_oracle(unknown: np.ndarray, known: np.ndarray):
    """Running top-3 per interpolate_gpu.cu:9-59."""
    B, n, _ = unknown.shape
    m = known.shape[1]
    dist2 = np.zeros((B, n, 3))
    idx = np.zeros((B, n, 3), np.int32)
    for b in range(B):
        for j in range(n):
            best = [1e40, 1e40, 1e40]
            besti = [0, 0, 0]
            for k in range(m):
                d = float(np.sum((unknown[b, j] - known[b, k]) ** 2))
                if d < best[0]:
                    best = [d, best[0], best[1]]
                    besti = [k, besti[0], besti[1]]
                elif d < best[1]:
                    best = [best[0], d, best[1]]
                    besti = [besti[0], k, besti[1]]
                elif d < best[2]:
                    best[2] = d
                    besti[2] = k
            dist2[b, j] = best
            idx[b, j] = besti
    return dist2, idx


def three_interpolate_oracle(points: np.ndarray, idx: np.ndarray, weight: np.ndarray):
    """(B, m, C) channels-last interpolation per interpolate_gpu.cu:72-113."""
    B, n, _ = idx.shape
    C = points.shape[2]
    out = np.zeros((B, n, C))
    for b in range(B):
        for j in range(n):
            for i in range(3):
                out[b, j] += weight[b, j, i] * points[b, idx[b, j, i]]
    return out


def group_points_oracle(points: np.ndarray, idx: np.ndarray):
    """(B, N, C) channels-last grouping per group_points_gpu.cu:8-33."""
    B, M, K = idx.shape
    C = points.shape[2]
    out = np.zeros((B, M, K, C), points.dtype)
    for b in range(B):
        for m in range(M):
            for k in range(K):
                out[b, m, k] = points[b, idx[b, m, k]]
    return out


# ---------------------------------------------------------------------------
# Vectorized equivalents of the loop oracles above. Same contracts, numpy
# array ops instead of index loops, so they run at model scale (N in the
# thousands) — used by tests/torch_ref.py to stand in for the reference's
# pointnet2._ext CUDA module when composing the full torch model on CPU.
# Parity with the loop oracles is itself asserted in test_model_parity.py.
# ---------------------------------------------------------------------------


def fps_fast(xyz: np.ndarray, npoint: int, skip_near_origin: bool = True) -> np.ndarray:
    """Vectorized fps_oracle: per-step argmax over the running min-distance."""
    B, N, _ = xyz.shape
    pts = xyz.astype(np.float64)
    mag = np.sum(pts * pts, axis=2)  # (B, N)
    skip = mag <= 1e-3 if skip_near_origin else np.zeros((B, N), bool)
    temp = np.full((B, N), 1e10)
    out = np.zeros((B, npoint), np.int32)
    old = np.zeros(B, np.int64)
    for j in range(1, npoint):
        ref = pts[np.arange(B), old]  # (B, 3)
        d = np.sum((pts - ref[:, None, :]) ** 2, axis=2)
        temp = np.where(skip, temp, np.minimum(temp, d))
        # strict ">" with earliest-index wins == first-occurrence argmax
        cand = np.where(skip, -np.inf, temp)
        old = np.argmax(cand, axis=1)
        out[:, j] = old
    return out


def ball_query_fast(
    radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray
) -> np.ndarray:
    """Vectorized ball_query_oracle: first nsample hits in index order,
    padded with the first hit (0 if no hits)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), np.int32)
    r2 = np.float32(radius) * np.float32(radius)
    for b in range(B):
        d2 = np.sum(
            (new_xyz[b][:, None, :].astype(np.float32) - xyz[b][None].astype(np.float32))
            ** 2,
            axis=2,
        )
        hit = d2 < r2  # (M, N)
        for j in range(M):
            hits = np.nonzero(hit[j])[0]
            if hits.size == 0:
                continue
            take = hits[:nsample]
            idx[b, j, :] = take[0]
            idx[b, j, : take.size] = take
    return idx


def three_nn_fast(unknown: np.ndarray, known: np.ndarray):
    """Vectorized three_nn_oracle: stable 3-smallest (ties -> lowest index)."""
    B, n, _ = unknown.shape
    dist2 = np.zeros((B, n, 3), np.float64)
    idx = np.zeros((B, n, 3), np.int32)
    for b in range(B):
        d2 = np.sum(
            (unknown[b][:, None, :].astype(np.float32) - known[b][None].astype(np.float32))
            ** 2,
            axis=2,
        )
        order = np.argsort(d2, axis=1, kind="stable")[:, :3]
        idx[b] = order.astype(np.int32)
        dist2[b] = np.take_along_axis(d2, order, axis=1)
    return dist2, idx


def three_interpolate_oracle_fast(points, idx, weight):
    """Vectorized three_interpolate_oracle: (B,m,C),(B,n,3),(B,n,3)->(B,n,C)."""
    B = points.shape[0]
    gathered = np.stack([points[b][idx[b]] for b in range(B)])  # (B,n,3,C)
    return np.sum(gathered * weight[..., None], axis=2)


def group_points_oracle_fast(points, idx):
    """Vectorized group_points_oracle: (B,N,C),(B,M,K)->(B,M,K,C)."""
    return np.stack([points[b][idx[b]] for b in range(points.shape[0])])
