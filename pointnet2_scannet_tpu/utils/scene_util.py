"""Virtual-scan scene subsampling.

Counterpart of the reference's lib/scene_util.py virtual_scan (:18-66), which
is DEAD code there (imported nowhere in the pipeline) but part of the
component inventory: simulate a single depth scan from a virtual camera at
human height — keep only points that (a) fall near a camera ray and (b) are
the closest point on their ray (a z-buffer visibility test).

Re-implemented without sklearn/scipy: the reference snaps each point to its
nearest ray by a KD-tree over (azimuth, elevation); here rays form a regular
az/el grid, so the nearest ray is a direct grid quantization — same geometry,
O(N) instead of a tree query.
"""

from __future__ import annotations

import numpy as np

# virtual sensor: 200 x 150 rays spanning +-0.6 x +-0.45 on the image plane
# at unit focal distance (reference :33-35)
GRID_X, GRID_Y = 200, 150
SPAN_X, SPAN_Y = 0.6, 0.45
MAX_ANGULAR_DIST = 0.01  # radians; reference :48
MIN_POINTS = 100


def cart2sph(xyz: np.ndarray) -> np.ndarray:
    """(N, 3) -> (azimuth, elevation, radius) (reference :8-15)."""
    xy = xyz[:, 0] ** 2 + xyz[:, 1] ** 2
    aer = np.zeros_like(xyz)
    aer[:, 2] = np.sqrt(xy + xyz[:, 2] ** 2)
    aer[:, 1] = np.arctan2(xyz[:, 2], np.sqrt(xy))
    aer[:, 0] = np.arctan2(xyz[:, 1], xyz[:, 0])
    return aer


def virtual_scan(
    xyz: np.ndarray, mode: int = -1, rng: np.random.Generator | None = None
) -> np.ndarray:
    """Indices of points visible from a virtual camera (empty if < 100)."""
    rng = rng or np.random.default_rng()
    camloc = xyz.mean(axis=0)
    camloc[2] = 1.5  # human height (reference :21)
    if mode == -1:
        view = np.array(
            [2 * np.pi * rng.random(), np.pi / 10 * (rng.random() - 0.75)]
        )
        camloc[:2] -= (0.8 + 0.7 * rng.random()) * np.array(
            [np.cos(view[0]), np.sin(view[0])]
        )
    else:
        view = np.array([np.pi / 4 * mode, 0.0])
        camloc[:2] -= np.array([np.cos(view[0]), np.sin(view[0])])

    # camera frame: center ray + horizontal/vertical image-plane axes
    ct = np.array(
        [
            np.cos(view[1]) * np.cos(view[0]),
            np.cos(view[1]) * np.sin(view[0]),
            np.sin(view[1]),
        ]
    )
    hr = np.cross(ct, [0.0, 0.0, 1.0])
    hr /= np.linalg.norm(hr)
    vt = np.cross(hr, ct)
    vt /= np.linalg.norm(vt)

    local = cart2sph(xyz - camloc)  # (az, el, r) of every point

    # ray grid in spherical coords (the rays lie on a regular image-plane
    # grid; quantize each point's (az, el) to the nearest grid node)
    xs = np.linspace(-SPAN_X, SPAN_X, GRID_X)
    ys = np.linspace(-SPAN_Y, SPAN_Y, GRID_Y)
    gx, gy = np.meshgrid(xs, ys)
    rays = gx.reshape(-1, 1) * hr + gy.reshape(-1, 1) * vt + ct
    rays_aer = cart2sph(rays)[:, :2].reshape(GRID_Y, GRID_X, 2)

    # nearest ray per point: project the point's direction onto the image
    # plane, quantize to the grid, then measure angular distance to that ray
    d = xyz - camloc
    dn = d / np.linalg.norm(d, axis=1, keepdims=True)
    depth_along_ct = dn @ ct
    in_front = depth_along_ct > 1e-6
    u = np.where(in_front, (dn @ hr) / np.maximum(depth_along_ct, 1e-6), 1e9)
    v = np.where(in_front, (dn @ vt) / np.maximum(depth_along_ct, 1e-6), 1e9)
    ix = np.clip(np.round((u + SPAN_X) / (2 * SPAN_X) * (GRID_X - 1)), 0, GRID_X - 1)
    iy = np.clip(np.round((v + SPAN_Y) / (2 * SPAN_Y) * (GRID_Y - 1)), 0, GRID_Y - 1)
    ray_id = (iy * GRID_X + ix).astype(np.int64)
    near = rays_aer[iy.astype(int), ix.astype(int)]  # (N, 2) az/el of ray
    ang = np.linalg.norm(local[:, :2] - near, axis=1)

    hit = in_front & (ang < MAX_ANGULAR_DIST)
    if hit.sum() < MIN_POINTS:
        return np.zeros(0, np.int64)

    # z-buffer: keep only the closest point per ray (reference :52-63)
    r = local[:, 2]
    order = np.argsort(r[hit], kind="stable")
    hit_idx = np.flatnonzero(hit)[order]
    min_r = {}
    keep = []
    for i in hit_idx:
        rid = ray_id[i]
        if rid not in min_r:
            min_r[rid] = r[i]
            keep.append(i)
        elif r[i] <= min_r[rid]:
            keep.append(i)
    return np.sort(np.asarray(keep, np.int64))
