"""Projection parity vs the REFERENCE ProjectionHelper (VERDICT r2 #3).

/root/reference/lib/projection.py is pure torch, so the real reference code
is imported directly (its hardcoded `.cuda()` calls shimmed to no-ops, the
same approach tests/torch_ref.py takes for `_ext`) and
`ProjectionHelper.compute_projection` (projection.py:191-256) is compared
pair-for-pair against data/multiview.compute_correspondence's fixed-shape
(valid, pix) redesign by unpacking the reference's packed `[count, idx...]`
vectors.

The redesign replicates the reference predicate chain verbatim — including
the QUANTIZED frustum cull (round(dot*100)/100 < 0, projection.py:142-144),
whose tiny front-plane normal rejects everything closer than ~0.65 m from
the camera. The only expected divergences are points within cross-stack
float-noise distance of a predicate boundary (quantization edges,
half-integer pixel rounding, depth-consistency edges); those are excluded
from the strict comparison and counted.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

from pointnet2_scannet_tpu.data.multiview import (
    CameraConfig,
    compute_correspondence,
    project_frame_features,
)

torch = pytest.importorskip("torch")

W, H = 41, 32
N_POINTS = 4096


@pytest.fixture(scope="module")
def helper():
    """The reference ProjectionHelper, cuda-shimmed onto CPU."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        from lib.projection import ProjectionHelper
    finally:
        pass  # leave the shim installed for the helper's lifetime
    cam = CameraConfig()
    intrinsic = torch.tensor(
        [
            [cam.fx, 0.0, cam.cx, 0.0],
            [0.0, cam.fy, cam.cy, 0.0],
            [0.0, 0.0, 1.0, 0.0],
            [0.0, 0.0, 0.0, 1.0],
        ]
    )
    ph = ProjectionHelper(
        intrinsic, cam.depth_min, cam.depth_max, [W, H], cam.accuracy, cuda=False
    )
    yield ph, cam
    torch.Tensor.cuda = orig_cuda


def random_pose(rng) -> np.ndarray:
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = q.astype(np.float32)
    pose[:3, 3] = rng.uniform(-1.0, 1.0, 3).astype(np.float32)
    return pose


def make_frame(rng, pose: np.ndarray, cam: CameraConfig):
    """Points clustered in front of the camera + a depth map that agrees with
    ~half of them (so the depth-consistency predicate passes both ways)."""
    # sample points in the camera frame inside/around the frustum, then move
    # them to world space with the pose
    n = N_POINTS
    z = rng.uniform(cam.depth_min - 0.5, cam.depth_max + 0.5, n)
    fx = rng.uniform(-3.0, W + 2.0, n)  # image coords incl. out-of-bounds
    fy = rng.uniform(-3.0, H + 2.0, n)
    x = (fx - cam.cx) / cam.fx * z
    y = (fy - cam.cy) / cam.fy * z
    cam_pts = np.stack([x, y, z, np.ones(n)], axis=1).astype(np.float32)
    world = (cam_pts @ pose.T)[:, :3].astype(np.float32)

    depth = rng.uniform(0.0, cam.depth_max + 1.0, (H, W)).astype(np.float32)
    # make the measured depth agree with a random half of the points
    px = np.round(fx).astype(int)
    py = np.round(fy).astype(int)
    inside = (px >= 0) & (px < W) & (py >= 0) & (py < H)
    agree = inside & (rng.uniform(size=n) < 0.5)
    depth[py[agree], px[agree]] = z[agree] + rng.uniform(
        -cam.accuracy * 0.8, cam.accuracy * 0.8, agree.sum()
    )
    return world, depth


def boundary_ambiguous(world, depth, pose, cam: CameraConfig) -> np.ndarray:
    """Points within cross-stack float-noise distance of any selection-
    predicate boundary — excluded from the strict pair comparison."""
    w2c = np.linalg.inv(pose.astype(np.float64))
    pc = np.concatenate([world, np.ones((len(world), 1))], axis=1)
    c = pc @ w2c.T
    with np.errstate(divide="ignore", invalid="ignore"):
        fx = c[:, 0] * cam.fx / c[:, 2] + cam.cx
        fy = c[:, 1] * cam.fy / c[:, 2] + cam.cy
    z = c[:, 2]

    # frustum quantization edges: the predicate round(dot*100)/100 < 0 flips
    # exactly at dot*100 = -0.5 and at every half-integer of dot*100 near 0;
    # it only changes OUTCOME at dot = -0.005, but cross-stack dot noise means
    # any dot*100 within eps of a half-integer boundary is ambiguous
    corners = []
    for d in (cam.depth_min, cam.depth_max):
        for ux, uy in ((0, 0), (W - 1, 0), (W - 1, H - 1), (0, H - 1)):
            corners.append(
                ((ux - cam.cx) / cam.fx * d, (uy - cam.cy) / cam.fy * d, d, 1.0)
            )
    cw = (np.asarray(corners, np.float64) @ pose.astype(np.float64).T)[:, :3]
    normals = np.stack(
        [
            np.cross(cw[3] - cw[0], cw[1] - cw[0]),
            np.cross(cw[2] - cw[1], cw[5] - cw[1]),
            np.cross(cw[3] - cw[2], cw[6] - cw[2]),
            np.cross(cw[0] - cw[3], cw[7] - cw[3]),
            np.cross(cw[1] - cw[0], cw[4] - cw[0]),
            np.cross(cw[6] - cw[5], cw[4] - cw[5]),
        ]
    )
    d1 = (world.astype(np.float64) - cw[2]) @ normals[:3].T
    d2 = (world.astype(np.float64) - cw[4]) @ normals[3:].T
    dots = np.concatenate([d1, d2], axis=1) * 100.0  # (N, 6)
    amb = (np.abs(dots - (-0.5)) < 1e-3).any(axis=1)

    eps_z = 2e-3
    px = np.clip(np.round(fx), 0, W - 1).astype(int)
    py = np.clip(np.round(fy), 0, H - 1).astype(int)
    d = depth[py, px].astype(np.float64)
    amb |= np.abs(np.abs(d - z) - cam.accuracy) < eps_z
    amb |= np.abs(d - cam.depth_min) < eps_z
    amb |= np.abs(d - cam.depth_max) < eps_z
    # near half-integer pixel coords the two stacks' float rounding can pick
    # different pixels
    amb |= np.abs(fx - np.floor(fx) - 0.5) < 1e-4
    amb |= np.abs(fy - np.floor(fy) - 0.5) < 1e-4
    return amb


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compute_projection_pair_parity(helper, seed):
    ph, cam = helper
    rng = np.random.default_rng(seed)
    pose = random_pose(rng)
    world, depth = make_frame(rng, pose, cam)

    ref = ph.compute_projection(
        torch.from_numpy(world), torch.from_numpy(depth), torch.from_numpy(pose)
    )
    assert ref is not None
    ind3d, ind2d = ref
    count = int(ind3d[0])
    ref_pairs = {
        (int(ind3d[1 + i]), int(ind2d[1 + i])) for i in range(count)
    }

    valid, pix = compute_correspondence(world, depth, pose, cam)
    valid = np.asarray(valid)
    pix = np.asarray(pix)
    our_pairs = {(int(i), int(pix[i])) for i in np.flatnonzero(valid)}

    amb = boundary_ambiguous(world, depth, pose, cam)
    ref_strict = {p for p in ref_pairs if not amb[p[0]]}
    our_strict = {p for p in our_pairs if not amb[p[0]]}
    assert ref_strict == our_strict, (
        f"strict pair mismatch: only-ref={list(ref_strict - our_strict)[:5]} "
        f"only-ours={list(our_strict - ref_strict)[:5]}"
    )
    # the comparison must be substantial, not vacuous
    assert len(ref_strict) > 300, len(ref_strict)
    assert amb.sum() < N_POINTS * 0.05, f"too many ambiguous points: {amb.sum()}"


def test_project_scatter_parity(helper):
    """ProjectionHelper.project (projection.py:259-279) vs
    project_frame_features on the same correspondence."""
    ph, cam = helper
    rng = np.random.default_rng(5)
    pose = random_pose(rng)
    world, depth = make_frame(rng, pose, cam)
    ref = ph.compute_projection(
        torch.from_numpy(world), torch.from_numpy(depth), torch.from_numpy(pose)
    )
    assert ref is not None
    ind3d, ind2d = ref
    feats = rng.normal(size=(16, H, W)).astype(np.float32)  # (C, H, W)
    ref_out = (
        ph.project(torch.from_numpy(feats), ind3d, ind2d, N_POINTS)
        .numpy()
        .T
    )  # (N, C)

    valid, pix = compute_correspondence(world, depth, pose, cam)
    ours = project_frame_features(
        np.moveaxis(feats, 0, -1), np.asarray(valid), np.asarray(pix), N_POINTS
    )
    amb = boundary_ambiguous(world, depth, pose, cam)
    np.testing.assert_allclose(ours[~amb], ref_out[~amb], atol=1e-6)
