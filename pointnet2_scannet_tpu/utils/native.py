"""ctypes bindings for the native host-ops library (cpp/hostops.cpp).

Auto-builds the shared library with `make` the first time it's needed (g++
ships in the image); every entry point has a numpy fallback so the package
works without a toolchain. See cpp/hostops.cpp for the kernel contracts.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_CPP_DIR = pathlib.Path(__file__).resolve().parent.parent.parent / "cpp"
_LIB_PATH = _CPP_DIR / "libhostops.so"
_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        src = _CPP_DIR / "hostops.cpp"
        stale = _LIB_PATH.exists() and (
            src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
        )
        if not _LIB_PATH.exists() or stale:
            # -B: a checked-out .so can predate a newer hostops.cpp; a stale
            # library silently drops new entry points (they degrade to the
            # numpy fallbacks), so force the rebuild. git doesn't preserve
            # mtimes, so a fresh clone can look "stale" spuriously — if the
            # rebuild fails (no toolchain) but a loadable .so exists, use it
            # rather than disabling every native path.
            try:
                subprocess.run(
                    ["make", "-B", "-C", str(_CPP_DIR)],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                if not _LIB_PATH.exists():
                    raise
        lib = ctypes.CDLL(str(_LIB_PATH))
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64pp = ctypes.POINTER(i64)
        lib.chunk_scan.restype = i64
        lib.chunk_scan.argtypes = [
            f32p, f32p, i64, f32p, f32p, ctypes.c_float, u8p, i64pp, i64pp,
        ]
        lib.unique_first_occurrence.restype = i64
        lib.unique_first_occurrence.argtypes = [i64p, i64, i64p, i64p]
        lib.tile_columns.restype = i64
        lib.tile_columns.argtypes = [
            f32p, i64, f32p, ctypes.c_float, ctypes.c_double,
            ctypes.c_double, i64, i64, i64p, i64p,
        ]
        lib.coord_first_occurrence.restype = i64
        lib.coord_first_occurrence.argtypes = [f32p, i64, i64p]
        try:  # added after round 3; older .so builds lack it
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            lib.voxelize_unique.restype = i64
            lib.voxelize_unique.argtypes = [
                f32p, i64, ctypes.c_double, f32p, f64p, i64p, i64p,
            ]
            lib.dedup_voxelize.restype = i64
            lib.dedup_voxelize.argtypes = [
                f32p, i64, ctypes.c_double, f32p, f64p, i64p, i64p, i64pp,
            ]
            lib._has_voxelize = True
        except AttributeError:
            lib._has_voxelize = False
        _lib = lib
    except Exception:  # noqa: BLE001 - fall back to numpy paths
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def chunk_scan(
    xyz: np.ndarray,
    labels: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    margin: float,
):
    """Fused crop-mask + annotated-count + voxel-occupancy scan.

    Returns (mask (n,) bool, annotated_count, occupied_voxels) with the
    lib/dataset.py:219-240 semantics. Falls back to numpy when the native
    library is unavailable.
    """
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    labels = np.ascontiguousarray(labels, np.float32)
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    n = len(xyz)
    if lib is not None:
        mask = np.empty(n, np.uint8)
        annotated = ctypes.c_int64()
        occupied = ctypes.c_int64()
        lib.chunk_scan(
            xyz, labels, n, lo, hi, ctypes.c_float(margin), mask,
            ctypes.byref(annotated), ctypes.byref(occupied),
        )
        return mask.astype(bool), int(annotated.value), int(occupied.value)
    # numpy fallback (multi-pass)
    mask = np.all((xyz >= lo - margin) & (xyz <= hi + margin), axis=1)
    sel = xyz[mask]
    lab = labels[mask]
    annotated = int(np.sum(lab > 0))
    tight = np.all((sel >= lo - 0.01) & (sel <= hi + 0.01), axis=1)
    extent = hi - lo
    if (extent <= 0).any() or not tight.any():
        return mask, annotated, 0
    vidx = np.ceil((sel[tight] - lo) / extent * [31.0, 31.0, 62.0])
    vidx = np.unique(vidx[:, 0] * 31.0 * 62.0 + vidx[:, 1] * 62.0 + vidx[:, 2])
    return mask, annotated, len(vidx)


def tile_columns(
    xyz: np.ndarray,
    coordmin: np.ndarray,
    zextent: float,
    L: float,
    tol: float,
    nx: int,
    ny: int,
):
    """Whole-scene column membership (lib/dataset.py:316-337 semantics).

    Returns (counts (nx, ny) int64, members int64) where members holds the
    point indices of every column concatenated in (i-major, j-minor) order,
    ascending within a column — identical membership and ordering to the
    reference's per-column mask loop (points within +-tol of a border appear
    in multiple columns).
    """
    lib = _load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    coordmin = np.ascontiguousarray(coordmin, np.float32)
    n = len(xyz)
    # the native kernel's ±1-bin scan and 4n member capacity require
    # tol < L/2; wider tolerances take the exact per-column loop below
    if lib is not None and tol * 2.0 < L:
        counts = np.empty(nx * ny, np.int64)
        members = np.empty(max(4 * n, 16), np.int64)
        total = lib.tile_columns(
            xyz, n, coordmin, ctypes.c_float(zextent),
            ctypes.c_double(L), ctypes.c_double(tol), nx, ny, counts, members,
        )
        if total >= 0:
            return counts.reshape(nx, ny), members[:total]
    # numpy fallback: the reference's per-column mask loop (float64 bounds,
    # exactly like `coordmin + [i*L, ...]` promotes)
    cmin = coordmin.astype(np.float64)
    counts = np.zeros((nx, ny), np.int64)
    out = []
    for i in range(nx):
        for j in range(ny):
            curmin = cmin + [i * L, j * L, 0.0]
            curmax = cmin + [(i + 1) * L, (j + 1) * L, float(zextent)]
            mask = np.all((xyz >= curmin - tol) & (xyz <= curmax + tol), axis=1)
            idx = np.flatnonzero(mask)
            counts[i, j] = len(idx)
            out.append(idx.astype(np.int64))
    return counts, np.concatenate(out) if out else np.empty(0, np.int64)


def unique_first_occurrence(keys: np.ndarray):
    """np.unique(keys, return_index=True) equivalent: returns (sorted unique
    keys, indices of their first occurrences)."""
    lib = _load()
    keys = np.ascontiguousarray(keys, np.int64)
    n = len(keys)
    if lib is not None:
        out_idx = np.empty(n, np.int64)
        out_keys = np.empty(n, np.int64)
        m = lib.unique_first_occurrence(keys, n, out_idx, out_keys)
        out_idx, out_keys = out_idx[:m], out_keys[:m]
        order = np.argsort(out_keys, kind="stable")
        return out_keys[order], out_idx[order]
    return np.unique(keys, return_index=True)


def dedup_voxelize(coords: np.ndarray, res: float, coordmin, nvox):
    """Fused per-scene metric front half: exact-row coordinate dedup + voxel
    first-occurrence over the surviving rows, one C pass.

    Returns (keep_idx, vox_idx): original-row indices of the deduped points
    (ascending) and of each voxel's representative point (first-encounter
    order — the metric formulas are order-invariant over voxels). None when
    the native fast path is unavailable (caller falls back to
    filter_points + surface_voxel_labels).
    """
    lib = _load()
    n = len(coords)
    if (
        lib is None
        or not getattr(lib, "_has_voxelize", False)
        or n == 0
        or coords.dtype != np.float32
    ):
        return None
    coords = np.ascontiguousarray(coords)
    keep_idx = np.empty(n, np.int64)
    vox_idx = np.empty(n, np.int64)
    vox_count = ctypes.c_int64(0)
    m1 = lib.dedup_voxelize(
        coords,
        n,
        float(res),
        np.ascontiguousarray(coordmin, np.float32),
        np.ascontiguousarray(nvox, np.float64),
        keep_idx,
        vox_idx,
        ctypes.byref(vox_count),
    )
    return keep_idx[:m1], vox_idx[: vox_count.value]


def voxelize_unique(coords: np.ndarray, res: float, coordmin, nvox):
    """Fused surface-voxel ids + first-occurrence unique (utils/voxel.py).

    Returns (sorted unique voxel ids as float64 — the numpy formula's dtype —
    and their first-occurrence indices). The native path replicates the
    all-float32 numpy formula bit-exactly (an f32 array divided by a python
    float stays f32 under both legacy and NEP-50 promotion) and only engages
    for float32 coords; anything else takes the numpy formula.
    """
    lib = _load()
    n = len(coords)
    if (
        lib is not None
        and getattr(lib, "_has_voxelize", False)
        and n > 0
        and coords.dtype == np.float32
    ):
        coords = np.ascontiguousarray(coords)
        out_idx = np.empty(n, np.int64)
        out_keys = np.empty(n, np.int64)
        m = lib.voxelize_unique(
            coords,
            n,
            float(res),
            np.ascontiguousarray(coordmin, np.float32),
            np.ascontiguousarray(nvox, np.float64),
            out_idx,
            out_keys,
        )
        out_idx, out_keys = out_idx[:m], out_keys[:m]
        order = np.argsort(out_keys, kind="stable")
        return out_keys[order].astype(np.float64), out_idx[order]
    vidx = np.ceil((coords - np.asarray(coordmin, coords.dtype)) / res)
    vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
    uvidx, vpidx = unique_first_occurrence(vidx.astype(np.int64))
    return uvidx.astype(np.float64), vpidx


def coord_first_occurrence(coords: np.ndarray) -> np.ndarray:
    """Indices of the first occurrence of each unique (x,y,z) row, in
    first-encounter order (== np.unique-by-row index set)."""
    lib = _load()
    coords = np.ascontiguousarray(coords, np.float32)
    n = len(coords)
    if lib is not None:
        out_idx = np.empty(n, np.int64)
        m = lib.coord_first_occurrence(coords, n, out_idx)
        return np.sort(out_idx[:m])
    view = coords.view(np.dtype((np.void, 12))).ravel()
    _, ids = np.unique(view, return_index=True)
    return np.sort(ids)
