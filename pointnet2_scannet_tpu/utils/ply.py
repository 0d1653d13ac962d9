"""Minimal PLY mesh/point-cloud I/O (ascii + binary_little_endian).

Replaces the reference's plyfile dependency (lib/pc_util.py:268-295,
scripts/visualize.py:103-105): reads ScanNet `_vh_clean_2.ply` meshes
(vertices with color + triangle faces) and writes colored point clouds for
visualization.
"""

from __future__ import annotations

import pathlib

import numpy as np

_PLY_DTYPES = {
    "char": "i1", "uchar": "u1", "int8": "i1", "uint8": "u1",
    "short": "i2", "ushort": "u2", "int16": "i2", "uint16": "u2",
    "int": "i4", "uint": "u4", "int32": "i4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str | pathlib.Path):
    """Parse a PLY file.

    Returns a dict element_name -> structured numpy array; list properties
    (e.g. face vertex_indices) come back as an (n, k) int array when k is
    uniform (triangle meshes), else a list of arrays.
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path} is not a PLY file")
        fmt = None
        elements: list[tuple[str, int, list]] = []  # (name, count, props)
        while True:
            line = f.readline()
            if not line:
                raise ValueError("unexpected EOF in PLY header")
            tokens = line.strip().decode("ascii", "replace").split()
            if not tokens or tokens[0] == "comment":
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "element":
                elements.append((tokens[1], int(tokens[2]), []))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    elements[-1][2].append(
                        (tokens[4], "list", _PLY_DTYPES[tokens[2]], _PLY_DTYPES[tokens[3]])
                    )
                else:
                    elements[-1][2].append((tokens[2], _PLY_DTYPES[tokens[1]]))
            elif tokens[0] == "end_header":
                break

        out = {}
        if fmt == "ascii":
            for name, count, props in elements:
                rows = [f.readline().split() for _ in range(count)]
                out[name] = _parse_ascii_element(rows, props)
        elif fmt == "binary_little_endian":
            for name, count, props in elements:
                out[name] = _parse_binary_element(f, count, props, "<")
        elif fmt == "binary_big_endian":
            for name, count, props in elements:
                out[name] = _parse_binary_element(f, count, props, ">")
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return out


def _parse_ascii_element(rows, props):
    has_list = any(len(p) == 4 for p in props)
    if not has_list:
        dtype = np.dtype([(p[0], p[1]) for p in props])
        arr = np.empty(len(rows), dtype)
        cols = np.array([[float(v) for v in r] for r in rows])
        for i, p in enumerate(props):
            arr[p[0]] = cols[:, i]
        return arr
    lists = []
    for r in rows:
        k = int(r[0])
        lists.append(np.array([int(v) for v in r[1 : 1 + k]]))
    return _stack_lists(lists)


def _parse_binary_element(f, count, props, endian):
    has_list = any(len(p) == 4 for p in props)
    if not has_list:
        dtype = np.dtype([(p[0], endian + p[1]) for p in props])
        return np.frombuffer(f.read(dtype.itemsize * count), dtype=dtype)
    # list property element (assume the element is a single list per row,
    # like ScanNet face definitions)
    (name, _, count_t, item_t) = props[0]
    count_dt = np.dtype(endian + count_t)
    item_dt = np.dtype(endian + item_t)
    lists = []
    for _ in range(count):
        k = int(np.frombuffer(f.read(count_dt.itemsize), count_dt)[0])
        lists.append(
            np.frombuffer(f.read(item_dt.itemsize * k), item_dt).astype(np.int64)
        )
    return _stack_lists(lists)


def _stack_lists(lists):
    if lists and all(len(x) == len(lists[0]) for x in lists):
        return np.stack(lists)
    return lists


def read_mesh_vertices_rgb_normal(path: str | pathlib.Path) -> np.ndarray:
    """(N, 9) [xyz, rgb, normal] from a ScanNet mesh, normals computed from
    faces (parity with lib/pc_util.py:268-287)."""
    from pointnet2_scannet_tpu.utils.normals import compute_vertex_normals

    data = read_ply(path)
    v = data["vertex"]
    n = len(v)
    out = np.zeros((n, 9), np.float32)
    out[:, 0] = v["x"]
    out[:, 1] = v["y"]
    out[:, 2] = v["z"]
    for i, c in enumerate(("red", "green", "blue")):
        if c in v.dtype.names:
            out[:, 3 + i] = v[c]
    if "face" in data and len(data["face"]):
        faces = np.asarray(data["face"])
        out[:, 6:9] = compute_vertex_normals(out[:, :3], faces)
    return out


def write_ply_points(
    path: str | pathlib.Path,
    points: np.ndarray,
    colors: np.ndarray | None = None,
) -> None:
    """Write an ascii PLY point cloud; colors are uint8 RGB."""
    points = np.asarray(points, np.float32)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write(
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            )
        f.write("end_header\n")
        if colors is not None:
            colors = np.asarray(colors).astype(np.uint8)
            for p, c in zip(points, colors):
                f.write(f"{p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        else:
            for p in points:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
