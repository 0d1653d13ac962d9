"""Surface voxelization for the voxel-level metrics.

Parity with point_cloud_label_to_surface_voxel_label_fast
(lib/pc_util.py:39-51): 0.02m grid over the point bbox, linear voxel id
x + y*nx + z*nx*ny, and each voxel labeled by ONE representative point — the
first point np.unique(return_index) happens to pick, NOT a majority vote
(SURVEY.md quirk 7; the published metrics were computed this way).
"""

from __future__ import annotations

import numpy as np


def surface_voxel_labels(
    coords: np.ndarray, labels: np.ndarray, res: float = 0.0484
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxelize a labeled point cloud.

    Args:
      coords: (N, 3) point coordinates.
      labels: (N,) or (N, K) integer labels per point (K label columns are
        voxelized together, e.g. [target, pred]).
      res: voxel resolution in meters (metrics use 0.02, eval.py:77,111).

    Returns:
      (uvidx, uvlabel, nvox): unique linear voxel ids, the representative
      point's label row per voxel, and the grid dimensions.
    """
    from pointnet2_scannet_tpu.utils import native

    coordmin = coords.min(axis=0)
    coordmax = coords.max(axis=0)
    nvox = np.ceil((coordmax - coordmin) / res)
    # fused native path: voxel-id computation + O(N) hash unique in one C
    # pass (numpy-promotion-exact; see native.voxelize_unique). Returns the
    # same (sorted keys, first-occurrence) pair as np.unique(return_index).
    uvidx, vpidx = native.voxelize_unique(coords, res, coordmin, nvox)
    uvlabel = labels[vpidx]
    return uvidx, uvlabel, nvox
