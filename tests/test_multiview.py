"""Multiview subsystem tests: camera correspondence, feature fusion, and the
ENet encoder (including torch-checkpoint parity when the reference weights
are available)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu.data.multiview import (
    CameraConfig,
    compute_correspondence,
    fuse_scene_features,
    project_frame_features,
)

REF_ENET_PTH = "/root/reference/data/scannetv2_enet.pth"


class TestCorrespondence:
    def setup_method(self):
        self.cam = CameraConfig()

    def test_point_on_axis_projects_to_center(self):
        # identity pose: camera at origin looking down +z
        pose = jnp.eye(4)
        pts = jnp.asarray([[0.0, 0.0, 2.0]])  # 2m straight ahead
        depth = jnp.full((self.cam.height, self.cam.width), 2.0)
        valid, pix = compute_correspondence(pts, depth, pose, self.cam)
        assert bool(valid[0])
        # principal point (cx=20, cy=15.5 -> rounds to 16)
        assert int(pix[0]) == 16 * self.cam.width + 20

    def test_depth_inconsistency_invalidates(self):
        pose = jnp.eye(4)
        pts = jnp.asarray([[0.0, 0.0, 2.0]])
        depth = jnp.full((self.cam.height, self.cam.width), 3.0)  # occluded
        valid, _ = compute_correspondence(pts, depth, pose, self.cam)
        assert not bool(valid[0])

    def test_behind_camera_invalid(self):
        pose = jnp.eye(4)
        pts = jnp.asarray([[0.0, 0.0, -2.0]])
        depth = jnp.full((self.cam.height, self.cam.width), 2.0)
        valid, _ = compute_correspondence(pts, depth, pose, self.cam)
        assert not bool(valid[0])

    def test_out_of_range_depth_invalid(self):
        pose = jnp.eye(4)
        pts = jnp.asarray([[0.0, 0.0, 5.0]])  # beyond depth_max=4
        depth = jnp.full((self.cam.height, self.cam.width), 5.0)
        valid, _ = compute_correspondence(pts, depth, pose, self.cam)
        assert not bool(valid[0])

    def test_translated_pose(self):
        pose = jnp.eye(4).at[2, 3].set(-1.0)  # camera moved to z=-1
        pts = jnp.asarray([[0.0, 0.0, 1.0]])  # now 2m ahead
        depth = jnp.full((self.cam.height, self.cam.width), 2.0)
        valid, pix = compute_correspondence(pts, depth, pose, self.cam)
        assert bool(valid[0])


class TestFusion:
    def test_scatter(self):
        H, W, C = 2, 3, 4
        feats = np.arange(H * W * C, dtype=np.float32).reshape(H, W, C)
        valid = np.array([True, False, True])
        pix = np.array([0, 0, 5])
        out = project_frame_features(feats, valid, pix, 3)
        np.testing.assert_array_equal(out[0], feats.reshape(-1, C)[0])
        np.testing.assert_array_equal(out[1], 0)
        np.testing.assert_array_equal(out[2], feats.reshape(-1, C)[5])

    def test_first_writer_wins_by_coverage(self):
        H, W, C = 1, 2, 1
        f0 = np.full((H, W, C), 1.0, np.float32)  # covers 1 point
        f1 = np.full((H, W, C), 2.0, np.float32)  # covers 2 points
        frame_feats = np.stack([f0, f1])
        valids = np.array([[True, False], [True, True]])
        pixes = np.zeros((2, 2), np.int32)
        out = fuse_scene_features(frame_feats, valids, pixes)
        # frame 1 has higher coverage -> visited first -> wins on point 0
        np.testing.assert_array_equal(out[:, 0], [2.0, 2.0])

    def test_uncovered_points_stay_zero(self):
        frame_feats = np.ones((1, 1, 1, 2), np.float32)
        valids = np.array([[False, True]])
        pixes = np.zeros((1, 2), np.int32)
        out = fuse_scene_features(frame_feats, valids, pixes)
        np.testing.assert_array_equal(out[0], [0.0, 0.0])
        np.testing.assert_array_equal(out[1], [1.0, 1.0])


class TestENet:
    def test_encoder_output_shape(self):
        from pointnet2_scannet_tpu.models.enet import ENetSemSeg

        model = ENetSemSeg(num_classes=41)
        x = jnp.zeros((1, 256, 328, 3))
        variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()
        logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
        # 256/8 x 328/8 at 41 classes (reference: 128-ch map at 32x41,
        # lib/enet.py docblock / SURVEY.md §2.1)
        assert logits.shape == (1, 32, 41, 41)

    @pytest.mark.skipif(
        not os.path.exists(REF_ENET_PTH), reason="reference ENet weights not mounted"
    )
    def test_torch_checkpoint_conversion_loads(self):
        from pointnet2_scannet_tpu.models.enet import (
            ENetSemSeg,
            load_torch_enet_weights,
        )

        variables = load_torch_enet_weights(REF_ENET_PTH)
        model = ENetSemSeg(num_classes=41)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32)
        logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]}, x
        )
        assert logits.shape == (1, 8, 8, 41)
        assert np.isfinite(np.asarray(logits)).all()

    @pytest.mark.skipif(
        not os.path.exists(REF_ENET_PTH), reason="reference ENet weights not mounted"
    )
    @pytest.mark.slow
    def test_torch_parity(self):
        """Converted flax ENet must reproduce the torch reference outputs."""
        import sys

        import torch

        sys.path.insert(0, "/root/reference")
        try:
            from lib.enet import create_enet
        finally:
            sys.path.remove("/root/reference")

        from pointnet2_scannet_tpu.models.enet import (
            ENetSemSeg,
            load_torch_enet_weights,
        )

        tmodel = create_enet(41)
        tmodel.load_state_dict(
            torch.load(REF_ENET_PTH, map_location="cpu", weights_only=False)
        )
        tmodel.eval()

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 3, 64, 96)).astype(np.float32)
        with torch.no_grad():
            want = tmodel(torch.from_numpy(x)).numpy()  # (1, 41, 8, 12)

        model = ENetSemSeg(num_classes=41)
        variables = load_torch_enet_weights(REF_ENET_PTH)
        got = jax.jit(lambda v, x: model.apply(v, x, train=False))(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


class TestENetSplit:
    def test_split_counts(self):
        from pointnet2_scannet_tpu.models.enet import (
            ENetSemSeg,
            NUM_FIXED_BOTTLENECKS,
            NUM_TRAINABLE_BOTTLENECKS,
            split_enet_for_3d,
        )

        model = ENetSemSeg(num_classes=41)
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()
        fixed, trainable, classifier = split_enet_for_3d(variables)
        # 14 fixed bottlenecks + initial block; 8 trainable; 1-conv classifier
        assert len(fixed["params"]) == NUM_FIXED_BOTTLENECKS + 1
        assert len(trainable["params"]) == NUM_TRAINABLE_BOTTLENECKS
        assert "conv" in classifier["params"]
        # partition is exact: no parameter lost or duplicated
        import jax as _jax

        total = len(_jax.tree_util.tree_leaves(variables["params"]))
        split_total = sum(
            len(_jax.tree_util.tree_leaves(t["params"]))
            for t in (fixed, trainable, classifier)
        )
        assert total == split_total
