"""Preprocessing + PLY I/O tests on synthetic raw-scan fixtures."""

import json
import struct

import numpy as np
import pytest

from pointnet2_scannet_tpu.config import NYU_CLASSES
from pointnet2_scannet_tpu.data.scannet_prep import (
    collect_scene,
    collect_scenes,
    load_label_map,
)
from pointnet2_scannet_tpu.utils.normals import compute_vertex_normals
from pointnet2_scannet_tpu.utils.ply import (
    read_ply,
    read_mesh_vertices_rgb_normal,
    write_ply_points,
)

RNG = np.random.default_rng(11)


def write_binary_mesh(path, verts, colors, faces):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"element vertex %d\n" % len(verts))
        f.write(
            b"property float x\nproperty float y\nproperty float z\n"
            b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
        )
        f.write(b"element face %d\n" % len(faces))
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for v, c in zip(verts, colors):
            f.write(struct.pack("<fffBBB", *v, *c))
        for face in faces:
            f.write(struct.pack("<Biii", 3, *face))


@pytest.fixture
def tiny_mesh(tmp_path):
    # two triangles in the z=0 plane -> normals (0,0,1) (winding ccw from +z)
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    colors = np.array([[255, 0, 0]] * 4, np.uint8)
    faces = np.array([[0, 1, 2], [2, 1, 3]])
    path = tmp_path / "mesh.ply"
    write_binary_mesh(path, verts, colors, faces)
    return path, verts, colors, faces


class TestPly:
    def test_read_binary_mesh(self, tiny_mesh):
        path, verts, colors, faces = tiny_mesh
        data = read_ply(path)
        np.testing.assert_allclose(
            np.stack([data["vertex"]["x"], data["vertex"]["y"], data["vertex"]["z"]], 1),
            verts,
        )
        np.testing.assert_array_equal(data["face"], faces)

    def test_vertices_rgb_normal(self, tiny_mesh):
        path, verts, colors, faces = tiny_mesh
        out = read_mesh_vertices_rgb_normal(path)
        assert out.shape == (4, 9)
        np.testing.assert_allclose(out[:, :3], verts)
        np.testing.assert_allclose(out[:, 3], 255)
        np.testing.assert_allclose(out[:, 6:9], [[0, 0, 1]] * 4, atol=1e-6)

    def test_ascii_roundtrip(self, tmp_path):
        pts = RNG.uniform(size=(10, 3)).astype(np.float32)
        colors = RNG.integers(0, 256, size=(10, 3)).astype(np.uint8)
        path = tmp_path / "points.ply"
        write_ply_points(path, pts, colors)
        data = read_ply(path)
        v = data["vertex"]
        np.testing.assert_allclose(
            np.stack([v["x"], v["y"], v["z"]], 1), pts, rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.stack([v["red"], v["green"], v["blue"]], 1), colors
        )


class TestNormals:
    def test_shared_vertex_averages_faces(self):
        # two faces meeting at a right angle along an edge
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0]], np.float64
        )
        faces = np.array([[0, 1, 3], [0, 3, 2]])
        n = compute_vertex_normals(verts, faces)
        norms = np.linalg.norm(n, axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)


@pytest.fixture
def raw_scene(tmp_path):
    """Fake ScanNet scan: mesh + segs + aggregation + label tsv."""
    sid = "scene9999_00"
    scan = tmp_path / "scans" / sid
    scan.mkdir(parents=True)
    n = 60
    verts = RNG.uniform(0, 2, size=(n, 3)).astype(np.float32)
    colors = RNG.integers(0, 256, size=(n, 3)).astype(np.uint8)
    faces = np.array([[i, (i + 1) % n, (i + 2) % n] for i in range(0, n - 2, 3)])
    write_binary_mesh(scan / f"{sid}_vh_clean_2.ply", verts, colors, faces)

    seg_ids = (np.arange(n) // 10).tolist()  # 6 segments of 10 vertices
    (scan / f"{sid}_vh_clean_2.0.010000.segs.json").write_text(
        json.dumps({"segIndices": seg_ids})
    )
    agg = {
        "segGroups": [
            {"id": 0, "label": "chair_raw", "segments": [0, 1]},
            {"id": 1, "label": "unknown_thing", "segments": [2]},
            {"id": 2, "label": "floor_raw", "segments": [3, 4, 5]},
        ]
    }
    (scan / f"{sid}.aggregation.json").write_text(json.dumps(agg))

    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcount\tc3\tc4\tc5\tnyu40id\tnyu40class\n"
        "1\tchair_raw\t1\t-\t-\t-\t5\tchair\n"
        "2\tfloor_raw\t1\t-\t-\t-\t2\tfloor\n"
        "3\tweird\t1\t-\t-\t-\t40\tsomething_unknown\n"
    )
    return tmp_path, sid, tsv


class TestCollect:
    def test_label_map(self, raw_scene):
        _, _, tsv = raw_scene
        m = load_label_map(tsv)
        assert m["chair_raw"] == "chair"
        assert m["floor_raw"] == "floor"
        assert m["weird"] == "otherprop"  # unmapped nyu40 -> otherprop

    def test_collect_scene_layout(self, raw_scene):
        root, sid, tsv = raw_scene
        data = collect_scene(root / "scans", sid, load_label_map(tsv))
        assert data.shape == (60, 11)
        labels = set(data[:, 10].astype(int))
        assert labels == {
            NYU_CLASSES.index("chair"),
            NYU_CLASSES.index("otherprop"),
            NYU_CLASSES.index("floor"),
        }
        # 20 chair pts (segments 0,1), 10 otherprop, 30 floor
        assert np.sum(data[:, 10] == NYU_CLASSES.index("chair")) == 20
        assert np.sum(data[:, 10] == NYU_CLASSES.index("floor")) == 30
        # instance ids distinct per aggregation group
        assert len(set(data[:, 9].astype(int))) == 3

    def test_collect_scenes_skips_errors(self, raw_scene, tmp_path):
        root, sid, tsv = raw_scene
        out = tmp_path / "prep"
        done = collect_scenes(
            root / "scans", [sid, "scene_missing_00"], tsv, out
        )
        assert done == [sid]
        assert (out / f"{sid}.npy").exists()
