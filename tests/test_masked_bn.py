"""Masked BatchNorm for padded whole-scene micro-batches (VERDICT r2 #5).

The whole-scene path zero-pads its trailing micro-batch to the compiled
shape; BN batch statistics must exclude those rows EXACTLY so training
matches the reference's unpadded ragged torch.split micro-batches
(lib/solver.py:155-169).
"""

from __future__ import annotations

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from pointnet2_scannet_tpu.engine import train_state as ts
from pointnet2_scannet_tpu.models.layers import MaskedBatchNorm, PointwiseMLP
from pointnet2_scannet_tpu.models.pointnet2 import PointNet2SemSeg, ssg_spec

N = 1024


def test_full_mask_matches_plain_batchnorm():
    """row_mask of all-ones must reproduce nn.BatchNorm bit-for-bit-ish:
    same outputs AND same updated running stats."""
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 2.0, size=(4, 64, 16)).astype(np.float32)
    mlp = PointwiseMLP((8, 8), bn=True)
    variables = mlp.init(jax.random.key(0), x, train=False)

    out_plain, mut_plain = mlp.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    out_masked, mut_masked = mlp.apply(
        variables, x, train=True, row_mask=jnp.ones(4), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_masked), rtol=1e-5, atol=1e-5
    )
    for (pa, pl), (ma, ml) in zip(
        jax.tree_util.tree_leaves_with_path(mut_plain),
        jax.tree_util.tree_leaves_with_path(mut_masked),
    ):
        np.testing.assert_allclose(
            np.asarray(pl), np.asarray(ml), rtol=1e-5, atol=1e-6, err_msg=str(pa)
        )


def test_masked_stats_equal_ragged_stats():
    """Zero-padded rows with mask == the unpadded ragged computation."""
    rng = np.random.default_rng(1)
    real = rng.normal(0.7, 1.3, size=(3, 32, 8)).astype(np.float32)
    padded = np.zeros((8, 32, 8), np.float32)
    padded[:3] = real
    mask = np.zeros(8, np.float32)
    mask[:3] = 1.0

    bn = MaskedBatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(padded), jnp.asarray(mask))
    out_pad, mut_pad = bn.apply(
        variables, jnp.asarray(padded), jnp.asarray(mask), mutable=["batch_stats"]
    )
    out_rag, mut_rag = bn.apply(
        variables, jnp.asarray(real), jnp.ones(3), mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_pad)[:3], np.asarray(out_rag), rtol=1e-5, atol=1e-6
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_pad["batch_stats"][k]),
            np.asarray(mut_rag["batch_stats"][k]),
            rtol=1e-5,
            atol=1e-7,
            err_msg=k,
        )


@pytest.mark.slow
class TestGradAccumPaddedVsRagged:
    """grad_accum_step on a zero-padded tail micro-batch must produce the
    same batch_stats / loss / gradients as the ragged (unpadded) batch."""

    def _setup(self):
        spec = dataclasses.replace(ssg_spec(20, 0), dropout=0.0)
        model = PointNet2SemSeg(spec=spec)
        rng = np.random.default_rng(3)
        pc = rng.uniform(0, 1.5, size=(4, N, 3)).astype(np.float32)
        tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
        state = ts.create_train_state(model, jax.random.key(0), pc[:1], tx)
        labels = rng.integers(0, 20, size=(4, N)).astype(np.int32)
        weights = rng.uniform(0.5, 2.0, size=(4, N)).astype(np.float32)
        return state, pc, labels, weights

    def test_padded_tail_matches_ragged(self):
        state, pc, labels, weights = self._setup()
        real = 2  # 2 real rows padded to the 4-row compiled shape
        padded = {
            "points": np.concatenate([pc[:real], np.zeros_like(pc[real:])]),
            "labels": np.concatenate([labels[:real], np.zeros_like(labels[real:])]),
            "weights": np.concatenate([weights[:real], np.zeros_like(weights[real:])]),
            "row_mask": np.array([1, 1, 0, 0], np.float32),
        }
        ragged = {
            "points": pc[:real],
            "labels": labels[:real],
            "weights": weights[:real],
            "row_mask": np.ones(real, np.float32),
        }
        key = jax.random.key(7)
        g_p, bs_p, loss_p, cnt_p, cm_p = ts.grad_accum_step(
            state, padded, key, jnp.int32(0), num_classes=20
        )
        g_r, bs_r, loss_r, cnt_r, cm_r = ts.grad_accum_step(
            state, ragged, key, jnp.int32(0), num_classes=20
        )
        np.testing.assert_allclose(
            float(loss_p), float(loss_r), rtol=1e-5
        )
        assert float(cnt_p) == float(cnt_r) == real * N
        np.testing.assert_allclose(np.asarray(cm_p), np.asarray(cm_r))
        for (pa, lp), (_, lr) in zip(
            jax.tree_util.tree_leaves_with_path(bs_p),
            jax.tree_util.tree_leaves_with_path(bs_r),
        ):
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(lr), rtol=1e-4, atol=1e-6,
                err_msg=f"batch_stats {pa}",
            )
        for (pa, lp), (_, lr) in zip(
            jax.tree_util.tree_leaves_with_path(g_p),
            jax.tree_util.tree_leaves_with_path(g_r),
        ):
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(lr), rtol=5e-3, atol=1e-5,
                err_msg=f"grads {pa}",
            )
