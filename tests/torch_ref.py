"""Load the REFERENCE torch PointNet++ stack on CPU by shimming its CUDA
extension (`pointnet2._ext`) with the numpy contract implementations from
tests/oracles.py.

The reference model code (/root/reference/pointnet2/pointnet2_semseg.py and
friends) is pure torch except for nine `_ext` kernels (pointnet2_utils.py:71,
107,113,140,177,199,232,252,282). Each shim function below reproduces the
documented CUDA contract with torch tensors in/out, so the *composed*
reference model — module wiring, BN axes/eps, use_xyz concatenation order,
max-pool, three-nn weighting, classifier head — runs end to end on CPU and
can be compared numerically against this framework's flax model.

Nothing here is imported by the framework itself; it is test scaffolding.
"""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np

try:  # pytest collects tests/ as a package; scripts may import it flat
    from tests import oracles
except ImportError:  # pragma: no cover
    import oracles

REF_DIR = pathlib.Path("/root/reference/pointnet2")


def _np(t):
    return t.detach().cpu().numpy()


def build_ext_shim():
    """A module with the pointnet2._ext API, backed by tests/oracles.py."""
    import torch

    ext = types.ModuleType("pointnet2._ext")

    def furthest_point_sampling(xyz, npoint):
        return torch.from_numpy(oracles.fps_fast(_np(xyz), int(npoint)))

    def gather_points(features, idx):
        f, i = _np(features), _np(idx).astype(np.int64)  # (B,C,N), (B,M)
        out = np.stack([f[b][:, i[b]] for b in range(f.shape[0])])
        return torch.from_numpy(out)

    def gather_points_grad(grad_out, idx, N):
        g, i = _np(grad_out), _np(idx).astype(np.int64)  # (B,C,M), (B,M)
        B, C, _ = g.shape
        out = np.zeros((B, C, N), g.dtype)
        for b in range(B):
            np.add.at(out[b].T, i[b], g[b].T)
        return torch.from_numpy(out)

    def three_nn(unknown, known):
        # neighbor SELECTION follows the CUDA contract oracle (f32 running
        # top-3); the distance VALUES are recomputed exactly in the input
        # dtype so float64 models stay float64 end to end (the multi-step
        # trajectory parity test needs f64-clean gradients on this side)
        u, k = _np(unknown), _np(known)
        _, idx = oracles.three_nn_fast(u, k)
        B, n, _ = idx.shape
        sel = np.stack([k[b][idx[b]] for b in range(B)])  # (B, n, 3, 3)
        dist2 = np.sum((u[:, :, None, :] - sel) ** 2, axis=-1).astype(u.dtype)
        return torch.from_numpy(dist2), torch.from_numpy(idx)

    def three_interpolate(features, idx, weight):
        f = _np(features)  # (B, C, m)
        i = _np(idx).astype(np.int64)  # (B, n, 3)
        w = _np(weight)  # (B, n, 3)
        B, C, _ = f.shape
        gath = np.stack([f[b][:, i[b]] for b in range(B)])  # (B, C, n, 3)
        out = np.einsum("bcnk,bnk->bcn", gath, w.astype(f.dtype))
        return torch.from_numpy(np.ascontiguousarray(out))

    def three_interpolate_grad(grad_out, idx, weight, m):
        g = _np(grad_out)  # (B,C,n)
        i = _np(idx).astype(np.int64)  # (B,n,3)
        w = _np(weight).astype(g.dtype)  # (B,n,3)
        B, C, _ = g.shape
        out = np.zeros((B, m, C), g.dtype)
        for b in range(B):
            for k in range(3):
                np.add.at(out[b], i[b, :, k], (w[b, :, k, None] * g[b].T))
        return torch.from_numpy(np.swapaxes(out, 1, 2).copy())

    def group_points(features, idx):
        f = _np(features)  # (B,C,N)
        out = oracles.group_points_oracle_fast(
            np.swapaxes(f, 1, 2), _np(idx).astype(np.int64)
        )  # (B,M,K,C)
        return torch.from_numpy(np.ascontiguousarray(out.transpose(0, 3, 1, 2)))

    def group_points_grad(grad_out, idx, N):
        g = _np(grad_out)  # (B,C,M,K)
        i = _np(idx).astype(np.int64)  # (B,M,K)
        B, C = g.shape[:2]
        out = np.zeros((B, N, C), g.dtype)
        for b in range(B):
            np.add.at(out[b], i[b].reshape(-1), g[b].reshape(C, -1).T)
        return torch.from_numpy(np.swapaxes(out, 1, 2).copy())

    def ball_query(new_xyz, xyz, radius, nsample):
        return torch.from_numpy(
            oracles.ball_query_fast(float(radius), int(nsample), _np(xyz), _np(new_xyz))
        )

    for fn in (
        furthest_point_sampling,
        gather_points,
        gather_points_grad,
        three_nn,
        three_interpolate,
        three_interpolate_grad,
        group_points,
        group_points_grad,
        ball_query,
    ):
        setattr(ext, fn.__name__, fn)
    return ext


_loaded = {}


def load_reference_modules():
    """Import the reference's pointnet2_semseg / pointnet2_modules /
    pointnet2_utils with the _ext shim installed. Idempotent."""
    if _loaded:
        return _loaded
    sys.dont_write_bytecode = True  # /root/reference is read-only
    pkg = types.ModuleType("pointnet2")
    pkg.__path__ = []  # mark as package so `import pointnet2._ext` resolves
    ext = build_ext_shim()
    pkg._ext = ext
    sys.modules.setdefault("pointnet2", pkg)
    sys.modules["pointnet2._ext"] = ext
    if str(REF_DIR) not in sys.path:
        sys.path.insert(0, str(REF_DIR))
    import pointnet2_semseg  # noqa: F401  (flat imports inside reference tree)
    import pointnet2_modules  # noqa: F401
    import pointnet2_utils  # noqa: F401

    _loaded.update(
        semseg=pointnet2_semseg, modules=pointnet2_modules, utils=pointnet2_utils
    )
    return _loaded
