"""Engine tests: loss, metrics parity, confusion matrices, checkpointing."""

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_scannet_tpu.engine import (
    compute_acc,
    compute_miou,
    confusion_matrix,
    confusion_to_point_metrics,
    weighted_cross_entropy,
)
from pointnet2_scannet_tpu.utils.voxel import surface_voxel_labels

RNG = np.random.default_rng(7)


class TestLoss:
    def test_matches_manual_softmax_ce(self):
        logits = RNG.normal(size=(2, 5, 4)).astype(np.float32)
        labels = RNG.integers(0, 4, size=(2, 5)).astype(np.int32)
        weights = RNG.uniform(0.1, 2.0, size=(2, 5)).astype(np.float32)
        got = float(
            weighted_cross_entropy(
                jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(weights)
            )
        )
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ce = -np.log(p[np.arange(2)[:, None], np.arange(5)[None], labels])
        want = float((ce * weights).mean())
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_scatter_free_ce_matches_optax(self):
        # the one-hot label pick must match optax's take_along_axis
        # formulation to float32 roundoff, values AND gradients (optax adds
        # the max back inside logsumexp, so 1-ULP differences are expected)
        import optax

        from pointnet2_scannet_tpu.engine.loss import softmax_ce_integer

        logits = jnp.asarray(RNG.normal(size=(4, 64, 20)).astype(np.float32))
        labels = jnp.asarray(RNG.integers(0, 20, size=(4, 64)).astype(np.int32))
        got = softmax_ce_integer(logits, labels)
        want = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )
        g_got = jax.grad(lambda l: jnp.sum(softmax_ce_integer(l, labels)))(logits)
        g_want = jax.grad(
            lambda l: jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(l, labels)
            )
        )(logits)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), atol=1e-7
        )

    def test_zero_weight_points_ignored(self):
        logits = RNG.normal(size=(1, 4, 3)).astype(np.float32)
        labels = np.array([[0, 1, 2, 0]], np.int32)
        w1 = np.array([[1, 1, 0, 0]], np.float32)
        l1 = float(
            weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w1))
        )
        # changing a zero-weight point's label must not change the loss
        labels2 = np.array([[0, 1, 0, 1]], np.int32)
        l2 = float(
            weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels2), jnp.asarray(w1))
        )
        np.testing.assert_allclose(l1, l2, rtol=1e-6)


class TestConfusion:
    def test_counts(self):
        preds = jnp.asarray([0, 1, 1, 2])
        labels = jnp.asarray([0, 1, 2, 2])
        cm = np.asarray(confusion_matrix(preds, labels, 3))
        want = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]])
        np.testing.assert_array_equal(cm, want)

    def test_point_metrics(self):
        cm = np.array([[8, 2, 0], [1, 9, 0], [0, 0, 0]])
        m = confusion_to_point_metrics(cm)
        np.testing.assert_allclose(m["point_acc"], 17 / 20)
        np.testing.assert_allclose(m["point_acc_per_class"], (0.8 + 0.9) / 2)
        iou0 = 8 / (10 + 9 - 8)
        iou1 = 9 / (10 + 11 - 9)
        np.testing.assert_allclose(m["point_miou"], (iou0 + iou1) / 2)

    def test_instance_part_miou(self):
        """Hand-computed ShapeNet-style instance mIoU: two categories with
        global part blocks [0,1] and [2,3,4]."""
        from pointnet2_scannet_tpu.engine.metrics import instance_part_miou

        offsets = np.array([0, 2], np.int32)
        sizes = np.array([2, 3], np.int32)
        labels = np.array(
            [
                [0, 0, 1, 1],  # cat 0
                [2, 2, 3, 3],  # cat 1: part 4 absent from gt AND pred -> IoU 1
            ],
            np.int32,
        )
        preds = np.array(
            [
                [0, 1, 1, 1],  # part0: i=1,u=2 -> .5; part1: i=2,u=3 -> 2/3
                [2, 2, 3, 0],  # part2: 2/2; part3: i=1,u=2 -> .5; part4: 1.0
            ],
            np.int32,
        )
        category = np.array([0, 1], np.int32)
        ins, per_cat = instance_part_miou(preds, labels, category, offsets, sizes)
        iou_shape0 = (0.5 + 2 / 3) / 2
        iou_shape1 = (1.0 + 0.5 + 1.0) / 3
        np.testing.assert_allclose(ins, (iou_shape0 + iou_shape1) / 2)
        # per-category PER-SHAPE lists (callers aggregate across batches
        # with per-shape weighting)
        np.testing.assert_allclose(per_cat[0], [iou_shape0])
        np.testing.assert_allclose(per_cat[1], [iou_shape1])
        # an out-of-block pred (the 0 in shape 1) must not crash and only
        # hurts via its gt part's union — already reflected in part3's 0.5


def _naive_voxel(coords, tlabels, plabels, res=0.02):
    """Independent loop voxelization for cross-checking the fast path."""
    cmin = coords.min(0)
    cmax = coords.max(0)
    nvox = np.ceil((cmax - cmin) / res)
    seen = {}
    for i in range(len(coords)):
        v = np.ceil((coords[i] - cmin) / res)
        key = v[0] + v[1] * nvox[0] + v[2] * nvox[0] * nvox[1]
        if key not in seen:
            seen[key] = (tlabels[i], plabels[i])
    keys = sorted(seen)
    return keys, np.array([seen[k] for k in keys])


class TestVoxelization:
    def test_representative_point_semantics(self):
        coords = RNG.uniform(0, 0.2, size=(300, 3)).astype(np.float32)
        t = RNG.integers(0, 5, 300)
        p = RNG.integers(0, 5, 300)
        uvidx, uvlabel, _ = surface_voxel_labels(
            coords, np.stack([t, p], 1), res=0.02
        )
        keys, want = _naive_voxel(coords, t, p)
        np.testing.assert_allclose(uvidx, keys)
        np.testing.assert_array_equal(uvlabel, want)


class TestMetricsParity:
    def setup_method(self):
        n = 2000
        self.coords = RNG.uniform(0, 1.5, size=(n, 3)).astype(np.float32)
        self.targets = RNG.integers(0, 6, n)
        self.preds = np.where(RNG.uniform(size=n) < 0.7, self.targets, RNG.integers(0, 6, n))
        self.weights = np.ones(n, np.float32)

    def test_fused_scene_metrics_match_standalone(self):
        # compute_scene_metrics shares one dedup+voxelization; outputs must
        # equal the standalone functions exactly
        from pointnet2_scannet_tpu.engine.metrics import (
            compute_miou,
            compute_scene_metrics,
        )

        acc, miou = compute_scene_metrics(
            self.coords, self.preds, self.targets, self.weights, num_classes=6
        )
        want_acc = compute_acc(
            self.coords, self.preds, self.targets, self.weights, num_classes=6
        )
        want_miou = compute_miou(
            self.coords, self.preds, self.targets, self.weights, num_classes=6
        )
        for got, want in list(zip(acc, want_acc)) + list(zip(miou, want_miou)):
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_front_half_matches_fallback(self, monkeypatch):
        # the native dedup_voxelize path must reproduce the two-step
        # filter_points + surface_voxel_labels fallback exactly
        from pointnet2_scannet_tpu.engine import metrics as M
        from pointnet2_scannet_tpu.utils import native

        coords = np.concatenate([self.coords, self.coords[:400]])
        preds = np.concatenate([self.preds, self.preds[:400]])
        targets = np.concatenate([self.targets, self.targets[:400]])
        w = np.ones(len(coords), np.float32)
        got = M.compute_scene_metrics(coords, preds, targets, w, num_classes=6)
        monkeypatch.setattr(native, "dedup_voxelize", lambda *a: None)
        want = M.compute_scene_metrics(coords, preds, targets, w, num_classes=6)
        for g_t, w_t in zip(got, want):
            for g, w_ in zip(g_t, w_t):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w_))

    def test_compute_acc_against_naive(self):
        pa, pa_pc, va, va_pc, cali, mask = compute_acc(
            self.coords, self.preds, self.targets, self.weights, num_classes=6
        )
        # point acc: no duplicate coords, so dedup is identity
        np.testing.assert_allclose(pa, np.mean(self.preds == self.targets))
        for c in range(6):
            sel = self.targets == c
            if sel.any():
                assert mask[c] == 1
                np.testing.assert_allclose(
                    pa_pc[c], np.mean(self.preds[sel] == self.targets[sel]), atol=1e-6
                )
        # voxel metrics against the naive voxelizer
        keys, vl = _naive_voxel(self.coords, self.targets, self.preds)
        np.testing.assert_allclose(va, np.mean(vl[:, 0] == vl[:, 1]))
        assert 0.0 < cali <= 1.0

    def test_compute_miou_against_naive(self):
        pm, vm, mask = compute_miou(
            self.coords, self.preds, self.targets, self.weights, num_classes=6
        )
        for c in range(6):
            inter = np.sum((self.preds == c) & (self.targets == c))
            union = np.sum(self.preds == c) + np.sum(self.targets == c) - inter
            if mask[c]:
                np.testing.assert_allclose(pm[c], inter / (union + 1e-8), atol=1e-6)
        assert vm.shape == (6,)

    def test_dedup_uses_first_occurrence(self):
        coords = np.array([[0, 0, 0], [1, 1, 1], [0, 0, 0]], np.float32)
        preds = np.array([1, 1, 0])
        targets = np.array([1, 1, 1])
        w = np.ones(3, np.float32)
        pa, *_ = compute_acc(coords, preds, targets, w, num_classes=3)
        # duplicate coord keeps FIRST occurrence (pred=1, correct)
        np.testing.assert_allclose(pa, 1.0)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        import optax

        from pointnet2_scannet_tpu.engine.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )
        from pointnet2_scannet_tpu.engine.train_state import TrainState

        params = {"w": jnp.arange(4.0), "b": jnp.ones(2)}
        tx = optax.adam(1e-3)
        state = TrainState.create(
            apply_fn=lambda *a, **k: None,
            params=params,
            batch_stats={"bn": {"mean": jnp.zeros(3)}},
            tx=tx,
        )
        state = state.replace(step=17)
        save_checkpoint(tmp_path, "model_best", state, epoch=3, best={"voxel_miou": 0.5})

        blank = TrainState.create(
            apply_fn=lambda *a, **k: None,
            params=jax.tree_util.tree_map(jnp.zeros_like, params),
            batch_stats={"bn": {"mean": jnp.ones(3)}},
            tx=tx,
        )
        restored, meta = restore_checkpoint(tmp_path, "model_best", blank)
        np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.arange(4.0))
        np.testing.assert_array_equal(
            np.asarray(restored.batch_stats["bn"]["mean"]), np.zeros(3)
        )
        assert restored.step == 17
        assert meta["epoch"] == 3
        assert meta["best"]["voxel_miou"] == 0.5
