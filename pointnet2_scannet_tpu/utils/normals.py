"""Per-vertex normals from a triangle mesh.

Parity with the reference's compute_normal (lib/pc_util.py:213-232):
unnormalized face cross-products accumulated onto each face's vertices, then
L2-normalized per vertex (zero-area/isolated vertices get a zero normal).
"""

from __future__ import annotations

import numpy as np


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """(N, 3) vertices, (F, 3) int faces -> (N, 3) unit normals."""
    normals = np.zeros_like(vertices, dtype=np.float64)
    tris = vertices[faces]  # (F, 3, 3)
    fn = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    for k in range(3):
        np.add.at(normals, faces[:, k], fn)
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return (normals / norm).astype(np.float32)
