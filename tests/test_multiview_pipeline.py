"""Integration test for the offline multiview pipeline CLI machinery:
synthetic frames -> ENet features -> correspondence -> fused per-point
features, on a downscaled camera."""

import pathlib
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from pointnet2_scannet_tpu.data.multiview import CameraConfig


@pytest.mark.slow
def test_process_scene_end_to_end(tmp_path, monkeypatch):
    import imageio.v2 as imageio

    import multiview as mvcli  # scripts/multiview.py

    # tiny camera: 48x32 color (ENet /8 -> 6x4 features), 6x4 depth
    monkeypatch.setattr(mvcli, "COLOR_DIMS", (48, 32))
    monkeypatch.setattr(mvcli, "DEPTH_DIMS", (6, 4))
    cam = CameraConfig(fx=5.0, fy=5.0, cx=3.0, cy=2.0, width=6, height=4)

    # scene: a wall of points 2m in front of the camera (z=2 plane)
    rng = np.random.default_rng(0)
    points = np.column_stack(
        [rng.uniform(-0.5, 0.5, 200), rng.uniform(-0.3, 0.3, 200), np.full(200, 2.0)]
    ).astype(np.float32)

    # two frames: identity pose, constant depth 2m
    scene_dir = tmp_path / "frames" / "scene0000_00"
    for sub in ("color", "depth", "pose"):
        (scene_dir / sub).mkdir(parents=True)
    for fid in ("0", "100"):
        imageio.imwrite(
            scene_dir / "color" / f"{fid}.jpg",
            rng.integers(0, 255, size=(32, 48, 3)).astype(np.uint8),
        )
        imageio.imwrite(
            scene_dir / "depth" / f"{fid}.png",
            np.full((4, 6), 2000, np.uint16),  # 2m in millimeters
        )
        np.savetxt(scene_dir / "pose" / f"{fid}.txt", np.eye(4))

    # randomly-initialized ENet encoder (weights don't matter for plumbing)
    from pointnet2_scannet_tpu.models.enet import ENetEncoder

    encoder = ENetEncoder()
    x0 = np.zeros((1, 32, 48, 3), np.float32)
    variables = jax.jit(lambda: encoder.init(jax.random.key(0), x0, train=False))()
    encoder_apply = jax.jit(lambda v, x: encoder.apply(v, x, train=False))

    fused = mvcli.process_scene(
        "scene0000_00", tmp_path / "frames", points, encoder_apply, variables,
        batch_size=2, cam=cam,
    )
    assert fused.shape == (200, 128)
    covered = (np.abs(fused).sum(1) > 0).mean()
    assert covered > 0.9  # nearly every point is in front of the camera
    assert np.isfinite(fused).all()
