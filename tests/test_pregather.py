"""Pregather layer-0 composition (PointwiseMLPPregather) parity.

The wide-channel SA fast path applies the first Dense to the features at
source resolution and gathers widths[0] channels instead of 3 + C
(models/layers.py PointwiseMLPPregather; engaged by SetAbstraction._pregather
for C_in >= 2 x widths[0]). It must be a pure re-association of the unfused
path: identical param/variable tree (checkpoint-interchangeable), forward and
gradients equal to f32 rounding, and the auto-gate must leave the narrow
recipes (the parity-pinned C=9 flagship) untouched.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.models.modules import SetAbstraction
from pointnet2_scannet_tpu.ops.tuning import ops_config


@pytest.fixture
def pregather_flag():
    old = ops_config.pregather_dense
    yield
    ops_config.pregather_dense = old


def _sa(use_xyz=True):
    return SetAbstraction(
        npoint=64, radii=[0.4], nsamples=[16], mlps=[[32, 32, 64]],
        use_xyz=use_xyz,
    )


def _data(c=80, n=512, b=2, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(0.0, 1.5, size=(b, n, 3)).astype(np.float32)
    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(feats)


def _init(mod, xyz, feats, flag):
    ops_config.pregather_dense = flag
    return mod.init(jax.random.key(0), xyz, feats, train=False)


@pytest.mark.parametrize("use_xyz", [True, False], ids=["xyz", "noxyz"])
def test_param_tree_identical(pregather_flag, use_xyz):
    """Same tree structure AND same init values: dense_0 is created through
    _Dense0Params on the pregather path but must match nn.Dense exactly."""
    mod = _sa(use_xyz)
    xyz, feats = _data()
    v_off = _init(mod, xyz, feats, False)
    v_on = _init(mod, xyz, feats, True)
    flat_off = jax.tree_util.tree_flatten_with_path(v_off)
    flat_on = jax.tree_util.tree_flatten_with_path(v_on)
    assert [p for p, _ in flat_off[0]] == [p for p, _ in flat_on[0]]
    for (path, a), (_, b) in zip(flat_off[0], flat_on[0]):
        assert a.shape == b.shape and a.dtype == b.dtype, path
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


@pytest.mark.parametrize("use_xyz", [True, False], ids=["xyz", "noxyz"])
@pytest.mark.parametrize("train", [False, True], ids=["eval", "train"])
def test_forward_parity(pregather_flag, use_xyz, train):
    mod = _sa(use_xyz)
    xyz, feats = _data()
    variables = _init(mod, xyz, feats, False)

    def run(flag):
        ops_config.pregather_dense = flag
        if train:
            out, _ = mod.apply(
                variables, xyz, feats, train=True,
                mutable=["batch_stats"],
            )
        else:
            out = mod.apply(variables, xyz, feats, train=False)
        new_xyz, h, idx = out
        return h, idx

    h_off, idx_off = run(False)
    h_on, idx_on = run(True)
    np.testing.assert_array_equal(np.asarray(idx_off), np.asarray(idx_on))
    np.testing.assert_allclose(
        np.asarray(h_on), np.asarray(h_off), rtol=2e-4, atol=2e-5
    )


def test_grad_parity(pregather_flag):
    """dL/dparams and dL/dfeatures agree between the compositions."""
    mod = _sa(True)
    xyz, feats = _data(c=80, n=256, b=2)
    variables = _init(mod, xyz, feats, False)

    def loss(v, f, flag):
        ops_config.pregather_dense = flag
        (_, h, _), _ = mod.apply(
            v, xyz, f, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(h * h)

    g_off = jax.grad(loss, argnums=(0, 1))(variables, feats, False)
    g_on = jax.grad(loss, argnums=(0, 1))(variables, feats, True)
    flat_off, _ = jax.tree_util.tree_flatten(g_off)
    flat_on, _ = jax.tree_util.tree_flatten(g_on)
    for a, b in zip(flat_off, flat_on):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-4 * scale
        )


def test_auto_gate():
    """Auto engages only at C_in >= 2 x widths[0], with the measured dtype
    envelope (f32 always, bf16 eval-only, f64 never — see
    SetAbstraction._pregather): the C=9 flagship recipe keeps its
    parity-pinned composition."""
    sa = _sa(True)
    f32 = jnp.zeros((1, 8, 6), jnp.float32)
    wide = jnp.zeros((1, 8, 80), jnp.float32)
    assert not sa._pregather(f32, [32, 32, 64], False)  # 9 < 64
    assert sa._pregather(wide, [32, 32, 64], False)  # 83 >= 64
    assert sa._pregather(wide, [32, 32, 64], True)  # f32: train too
    assert not sa._pregather(None, [32, 32, 64], False)
    bf16 = jnp.zeros((1, 8, 80), jnp.bfloat16)
    assert sa._pregather(bf16, [32, 32, 64], False)  # bf16 eval: fwd-only win
    assert not sa._pregather(bf16, [32, 32, 64], True)  # bf16 train: loss
    jax.config.update("jax_enable_x64", True)
    try:
        f64 = jnp.zeros((1, 8, 80), jnp.float64)
        assert not sa._pregather(f64, [32, 32, 64], False)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_model_level_parity_mv131(pregather_flag):
    """Full PointNet2SemSeg at the 131-channel multiview input: pregather
    auto-engages at SA1 (and the MSG widths) and the logits match the
    unfused composition."""
    xyz_feats = np.random.default_rng(1).uniform(
        0.0, 1.5, size=(2, 1024, 3 + 131)
    ).astype(np.float32)
    x = jnp.asarray(xyz_feats)
    for is_msg in (False, True):
        model = models.get_model(
            num_classes=20, is_msg=is_msg, input_channels=131
        )
        ops_config.pregather_dense = False
        variables = model.init(jax.random.key(0), x[:1], train=False)
        logits_off = model.apply(variables, x, train=False)
        ops_config.pregather_dense = None  # auto
        logits_on = model.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(logits_on), np.asarray(logits_off),
            rtol=2e-3, atol=2e-3, err_msg=f"is_msg={is_msg}",
        )
