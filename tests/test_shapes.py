"""Unit tests for the synthetic shape-classification dataset (data/shapes.py).

Pure numpy — pins sampler invariants (points on the intended surfaces),
batch-dict conventions, and augmentation behavior.
"""

import numpy as np
import pytest

from pointnet2_scannet_tpu.data.shapes import (
    SHAPE_CLASSES,
    SHAPE_PARTS,
    make_shape_cloud,
    num_parts_total,
    part_offsets,
    sample_cls_batch,
    sample_partseg_batch,
)


@pytest.mark.parametrize("kind", SHAPE_CLASSES)
def test_cloud_shape_and_center(kind):
    rng = np.random.default_rng(0)
    pts = make_shape_cloud(kind, 256, rng, augment=False)
    assert pts.shape == (256, 3) and pts.dtype == np.float32
    # unaugmented clouds sit at center (2,2,2), radius <= ~1.8 (pyramid/cube
    # diagonals), and never near the origin (FPS origin-skip safety)
    r = np.linalg.norm(pts - 2.0, axis=-1)
    assert r.max() < 1.9, (kind, r.max())
    assert np.linalg.norm(pts, axis=-1).min() > 0.5


def test_surface_invariants():
    rng = np.random.default_rng(1)
    sph = make_shape_cloud("sphere", 512, rng, augment=False) - 2.0
    np.testing.assert_allclose(np.linalg.norm(sph, axis=-1), 1.0, atol=1e-5)
    cube = make_shape_cloud("cube", 512, rng, augment=False) - 2.0
    assert np.all(np.isclose(np.abs(cube), 1.0, atol=1e-6).any(axis=-1))
    octa = make_shape_cloud("octahedron", 512, rng, augment=False) - 2.0
    np.testing.assert_allclose(np.abs(octa).sum(axis=-1), 1.0, atol=1e-5)
    tor = make_shape_cloud("torus", 512, rng, augment=False) - 2.0
    ring = np.sqrt(tor[:, 0] ** 2 + tor[:, 1] ** 2)
    np.testing.assert_allclose(
        np.sqrt((ring - 1.0) ** 2 + tor[:, 2] ** 2), 0.35, atol=1e-5
    )


def test_batch_convention_and_determinism():
    b1 = sample_cls_batch(np.random.default_rng(7), 16, 128, 4)
    b2 = sample_cls_batch(np.random.default_rng(7), 16, 128, 4)
    assert b1["points"].shape == (16, 128, 3)
    assert b1["labels"].shape == (16,) and b1["labels"].dtype == np.int32
    assert b1["labels"].min() >= 0 and b1["labels"].max() < 4
    np.testing.assert_array_equal(b1["weights"], np.ones(16, np.float32))
    np.testing.assert_array_equal(b1["points"], b2["points"])
    np.testing.assert_array_equal(b1["labels"], b2["labels"])


def test_num_classes_bounds():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        sample_cls_batch(rng, 4, 64, len(SHAPE_CLASSES) + 1)
    with pytest.raises(ValueError):
        sample_partseg_batch(rng, 4, 64, len(SHAPE_CLASSES) + 1)


@pytest.mark.parametrize("kind", SHAPE_CLASSES)
def test_part_labels_geometry(kind):
    """Part ids match the canonical-frame geometric rules for every class."""
    rng = np.random.default_rng(3)
    pts, parts = make_shape_cloud(kind, 1024, rng, augment=False, return_parts=True)
    p = pts.astype(np.float64) - 2.0  # back to the canonical frame
    n_parts = len(SHAPE_PARTS[kind])
    assert parts.shape == (1024,) and parts.min() >= 0 and parts.max() < n_parts
    assert len(np.unique(parts)) == n_parts  # every part represented
    if kind in ("sphere", "octahedron"):
        np.testing.assert_array_equal(parts, (p[:, 2] < 0).astype(np.int32))
    elif kind == "cylinder":
        caps = np.isclose(np.abs(p[:, 2]), 1.0, atol=1e-5)
        assert np.all(parts[~caps] == 0)
        assert np.all((parts[caps] == 1) == (p[caps, 2] > 0))
    elif kind == "torus":
        ring = np.sqrt(p[:, 0] ** 2 + p[:, 1] ** 2)
        np.testing.assert_array_equal(parts, (ring < 1.0).astype(np.int32))
    elif kind == "cone":
        np.testing.assert_array_equal(
            parts, np.isclose(p[:, 2], -1.0, atol=1e-5).astype(np.int32)
        )


def test_partseg_batch_convention():
    K = 3
    b = sample_partseg_batch(np.random.default_rng(5), 8, 256, K)
    assert b["points"].shape == (8, 256, 3 + K)
    assert b["labels"].shape == (8, 256)
    assert b["weights"].shape == (8, 256)
    offsets = part_offsets(K)
    total = num_parts_total(K)
    assert b["labels"].min() >= 0 and b["labels"].max() < total
    for i in range(8):
        c = int(b["category"][i])
        # one-hot channels constant per cloud and matching the category
        onehot = b["points"][i, :, 3:]
        expect = np.zeros(K, np.float32)
        expect[c] = 1.0
        np.testing.assert_array_equal(onehot, np.tile(expect, (256, 1)))
        # labels confined to the category's global part block
        lo = offsets[c]
        hi = lo + len(SHAPE_PARTS[SHAPE_CLASSES[c]])
        assert b["labels"][i].min() >= lo and b["labels"][i].max() < hi
