"""Model-level shape/value tests for the SSG/MSG segmentation models.

Everything is wrapped in jax.jit — eager flax init/apply dispatches hundreds
of single-op XLA compiles and is pathologically slow on the CPU test backend.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu import models

N = 2048  # points per chunk in tests (smaller than prod 8192 for speed)


def make_batch(b, c_extra, seed=0):
    rng = np.random.default_rng(seed)
    pc = rng.uniform(0, 1.5, size=(b, N, 3 + c_extra)).astype(np.float32)
    return jnp.asarray(pc)


@functools.cache
def build(is_msg: bool, c_extra: int):
    """Init + jitted apply fns, cached across tests to amortize compiles."""
    model = models.get_model(num_classes=20, is_msg=is_msg, input_channels=c_extra)
    pc = make_batch(1, c_extra)
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc, train=False))()

    @jax.jit
    def fwd(variables, pc):
        return model.apply(variables, pc, train=False)

    @jax.jit
    def fwd_train(variables, pc, key):
        return model.apply(
            variables, pc, train=True, rngs={"dropout": key}, mutable=["batch_stats"]
        )

    return model, variables, fwd, fwd_train


class TestPointNet2SemSeg:
    @pytest.mark.parametrize("is_msg", [False, True])
    def test_forward_shapes(self, is_msg):
        _, variables, fwd, _ = build(is_msg, 3)
        logits = fwd(variables, make_batch(1, 3))
        assert logits.shape == (1, N, 20)
        assert np.isfinite(np.asarray(logits)).all()

    def test_xyz_only_input(self):
        _, variables, fwd, _ = build(False, 0)
        logits = fwd(variables, make_batch(1, 0))
        assert logits.shape == (1, N, 20)

    def test_train_mode_updates_batch_stats_and_dropout(self):
        _, variables, _, fwd_train = build(False, 0)
        logits, mutated = fwd_train(variables, make_batch(1, 0), jax.random.key(1))
        assert logits.shape == (1, N, 20)
        # running stats must have moved away from init (mean 0)
        leaf = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(np.abs(np.asarray(x)).max() > 0 for x in leaf)

    def test_grad_flows_everywhere(self):
        model, variables, _, _ = build(False, 0)
        pc = make_batch(1, 0)

        @jax.jit
        def grad_fn(params):
            def loss_fn(params):
                logits, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    pc,
                    train=True,
                    rngs={"dropout": jax.random.key(1)},
                    mutable=["batch_stats"],
                )
                return jnp.mean(logits**2)

            return jax.grad(loss_fn)(params)

        grads = grad_fn(variables["params"])
        flat, _ = jax.tree_util.tree_flatten(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # every SA/FP/head kernel must receive a nonzero gradient
        nonzero = [float(np.abs(np.asarray(g)).max()) > 0 for g in flat]
        assert sum(nonzero) > len(nonzero) * 0.9

    def test_spec_channel_accounting(self):
        ssg = models.ssg_spec(20, 6)
        assert ssg.sa_out_channels == (64, 128, 256, 512)
        assert ssg.skip_channels == (6, 64, 128, 256, 512)
        msg = models.msg_spec(20, 6)
        assert msg.sa_out_channels == (96, 256, 512, 1024)


def test_bf16_compute_path():
    import jax.numpy as jnp

    model = models.get_model(num_classes=20, is_msg=False, input_channels=0,
                             dtype=jnp.bfloat16)
    pc = make_batch(1, 0)
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc, train=False))()
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, pc)
    assert logits.dtype == jnp.float32  # logits cast back for the loss
    assert np.isfinite(np.asarray(logits)).all()
    # params stay float32 master copies
    assert all(
        p.dtype == jnp.float32 for p in jax.tree_util.tree_leaves(variables["params"])
    )


def test_no_bn_and_no_xyz_variants_build():
    for kwargs in ({"bn": False}, {"use_xyz": False}):
        model = models.get_model(num_classes=20, is_msg=False, input_channels=3,
                                 **kwargs)
        pc = make_batch(1, 3)
        variables = jax.jit(lambda m=model, p=pc: m.init(jax.random.key(0), p, train=False))()
        logits = jax.jit(lambda v, x, m=model: m.apply(v, x, train=False))(variables, pc)
        assert logits.shape == (1, N, 20)
        assert np.isfinite(np.asarray(logits)).all()


class TestSetAbstractionVotes:
    def _run(self, **kw):
        from pointnet2_scannet_tpu.models.modules import SetAbstractionVotes

        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.uniform(0, 1.5, (2, 256, 3)).astype(np.float32))
        feats = jnp.asarray(rng.normal(size=(2, 256, 8)).astype(np.float32))
        mod = SetAbstractionVotes(
            mlp=(11, 16, 32), npoint=64, radius=0.3, nsample=16, **kw
        )
        variables = mod.init(
            {"params": jax.random.key(0), "sample": jax.random.key(1)},
            xyz, feats,
        )
        return mod, variables, xyz, feats

    @pytest.mark.parametrize("pooling", ["max", "avg", "rbf"])
    def test_pooling_modes(self, pooling):
        mod, v, xyz, feats = self._run(pooling=pooling)
        new_xyz, pooled, inds = mod.apply(
            v, xyz, feats, rngs={"sample": jax.random.key(2)}
        )
        assert new_xyz.shape == (2, 64, 3)
        assert pooled.shape == (2, 64, 32)
        assert inds.shape == (2, 64)
        assert np.isfinite(np.asarray(pooled)).all()

    def test_unique_cnt_and_uniform_sampling(self):
        mod, v, xyz, feats = self._run(sample_uniformly=True, ret_unique_cnt=True)
        new_xyz, pooled, inds, cnt = mod.apply(
            v, xyz, feats, rngs={"sample": jax.random.key(2)}
        )
        c = np.asarray(cnt)
        assert c.shape == (2, 64)
        assert (c >= 1).all() and (c <= 16).all()

    def test_precomputed_inds(self):
        mod, v, xyz, feats = self._run()
        inds = jnp.tile(jnp.arange(64, dtype=jnp.int32)[None], (2, 1))
        new_xyz, pooled, out_inds = mod.apply(
            v, xyz, feats, inds, rngs={"sample": jax.random.key(2)}
        )
        np.testing.assert_array_equal(np.asarray(out_inds), np.asarray(inds))
        np.testing.assert_allclose(
            np.asarray(new_xyz), np.asarray(xyz[:, :64]), atol=1e-6
        )
