"""Numeric parity for the inventory-completing modules: SetAbstractionMSGVotes
(ref pointnet2_modules.py:274-353), LearnableFeaturePropagationMSG (:418-496),
FC (pytorch_utils.py:225-268), and the BN-momentum schedule (:271-297) —
each checked in eval mode against the reference torch module run through the
_ext shim (tests/torch_ref.py), plus a running-stat check for bn_momentum."""

import sys

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu.models import (
    FC,
    BNMomentumScheduler,
    LearnableFeaturePropagationMSG,
    PointwiseMLP,
    SetAbstractionMSGVotes,
)

sys.path.insert(0, "tests")
from tests.torch_ref import load_reference_modules  # noqa: E402

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(11)


def _variables_from_torch(fmodule, init_args, tmodule, key_map):
    """Map a torch state_dict into a flax variables tree via key_map(path)."""
    sd = {k: v.detach().numpy() for k, v in tmodule.state_dict().items()}
    init_vars = fmodule.init(jax.random.key(0), *init_args)
    out = {}
    for col, tree in init_vars.items():
        flat = flax.traverse_util.flatten_dict(tree)
        new = {}
        for path in flat:
            w = sd[key_map(path)]
            if path[-1] == "kernel":
                w = w.reshape(w.shape[0], w.shape[1]).T
            new[path] = jnp.asarray(w)
        out[col] = flax.traverse_util.unflatten_dict(new)
    return out


def _mlp_key(base, path):
    layer = path[-2].split("_")[1]
    if path[-2].startswith("dense"):
        return f"{base}.layer{layer}.conv.weight"
    m = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
    return f"{base}.layer{layer}.bn.bn.{m[path[-1]]}"


def test_sa_msg_votes_parity():
    mods = load_reference_modules()
    xyz = RNG.uniform(-1.5, 1.5, (2, 256, 3)).astype(np.float32)
    feats = RNG.normal(size=(2, 256, 4)).astype(np.float32)
    inds = RNG.permutation(256)[:64][None].repeat(2, axis=0).astype(np.int32)

    torch.manual_seed(2)
    tm = mods["modules"].PointnetSAModuleMSGVotes(
        mlps=[[4, 8, 16], [4, 8, 32]], npoint=64, radii=[0.2, 0.4],
        nsamples=[8, 16], use_xyz=True, bn=True,
    )
    tm.eval()
    with torch.no_grad():
        txyz, tfeat, tinds = tm(
            torch.from_numpy(xyz),
            torch.from_numpy(np.ascontiguousarray(feats.transpose(0, 2, 1))),
            torch.from_numpy(inds),
        )

    fm = SetAbstractionMSGVotes(
        npoint=64, radii=(0.2, 0.4), nsamples=(8, 16), mlps=((8, 16), (8, 32)),
        use_xyz=True, bn=True,
    )
    variables = _variables_from_torch(
        fm, (jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(inds)), tm,
        lambda path: _mlp_key(f"mlps.{path[0].split('_')[1]}", path),
    )
    nxyz, nfeat, ninds = fm.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(inds)
    )
    np.testing.assert_array_equal(np.asarray(ninds), tinds.numpy())
    np.testing.assert_allclose(np.asarray(nxyz), txyz.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(nfeat), np.swapaxes(tfeat.numpy(), 1, 2), atol=1e-4
    )


def test_lfp_msg_parity():
    mods = load_reference_modules()
    xyz2 = RNG.uniform(-1.5, 1.5, (2, 64, 3)).astype(np.float32)
    xyz1 = RNG.uniform(-1.5, 1.5, (2, 256, 3)).astype(np.float32)
    f2 = RNG.normal(size=(2, 64, 6)).astype(np.float32)
    f1 = RNG.normal(size=(2, 256, 4)).astype(np.float32)

    torch.manual_seed(3)
    tm = mods["modules"].PointnetLFPModuleMSG(
        mlps=[[4, 8, 16], [4, 8, 16]], radii=[0.3, 0.6], nsamples=[8, 16],
        post_mlp=[22, 12], use_xyz=True, bn=True,
    )
    tm.eval()
    with torch.no_grad():
        tout = tm(
            torch.from_numpy(xyz2), torch.from_numpy(xyz1),
            torch.from_numpy(np.ascontiguousarray(f2.transpose(0, 2, 1))),
            torch.from_numpy(np.ascontiguousarray(f1.transpose(0, 2, 1))),
        )

    fm = LearnableFeaturePropagationMSG(
        mlps=((8, 16), (8, 16)), radii=(0.3, 0.6), nsamples=(8, 16),
        post_mlp=(12,), use_xyz=True, bn=True,
    )

    def key_map(path):
        if path[0] == "post_mlp":
            return _mlp_key("post_mlp", path)
        return _mlp_key(f"mlps.{path[0].split('_')[1]}", path)

    args = (jnp.asarray(xyz2), jnp.asarray(xyz1), jnp.asarray(f2), jnp.asarray(f1))
    variables = _variables_from_torch(fm, args, tm, key_map)
    out = fm.apply(variables, *args)
    np.testing.assert_allclose(
        np.asarray(out), np.swapaxes(tout.numpy(), 1, 2), atol=1e-4
    )


@pytest.mark.parametrize("preact", [False, True])
def test_fc_parity(preact):
    mods = load_reference_modules()
    import pytorch_utils as pt_utils

    x = RNG.normal(size=(8, 12)).astype(np.float32)
    torch.manual_seed(4)
    tm = pt_utils.FC(12, 5, bn=True, preact=preact)
    tm.eval()
    with torch.no_grad():
        tout = tm(torch.from_numpy(x)).numpy()

    fm = FC(out_size=5, bn=True, preact=preact)

    def key_map(path):
        if path[-2] == "fc":
            return "fc.weight" if path[-1] == "kernel" else "fc.bias"
        m = {"scale": "weight", "bias": "bias", "mean": "running_mean", "var": "running_var"}
        return f"bn.bn.{m[path[-1]]}"

    variables = _variables_from_torch(fm, (jnp.asarray(x),), tm, key_map)
    out = fm.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), tout, atol=1e-5)


def test_bn_momentum_schedule_updates_running_stats():
    """bn_momentum passed at apply time must control the running-stat EMA:
    new = m*old + (1-m)*batch (flax convention)."""
    mlp = PointwiseMLP((6,), bn=True)
    x = RNG.normal(2.0, 3.0, (4, 16, 3)).astype(np.float32)
    variables = mlp.init(jax.random.key(0), x, True)

    def run(momentum):
        _, mut = mlp.apply(variables, x, True, momentum, mutable=["batch_stats"])
        return jax.tree_util.tree_map(np.asarray, mut["batch_stats"])

    z = x.reshape(-1, 3) @ np.asarray(variables["params"]["dense_0"]["kernel"])
    bmean, bvar = z.mean(0), z.var(0)
    for m in (0.9, 0.5, 0.0):
        stats = run(m)
        np.testing.assert_allclose(stats["bn_0"]["mean"], (1 - m) * bmean, rtol=1e-5)
        np.testing.assert_allclose(
            stats["bn_0"]["var"], m * 1.0 + (1 - m) * bvar, rtol=1e-5
        )
    # traced scalar (the scheduler path): same result, no recompile needed
    stats = jax.jit(
        lambda mom: mlp.apply(variables, x, True, mom, mutable=["batch_stats"])[1]
    )(jnp.float32(0.5))
    np.testing.assert_allclose(
        np.asarray(stats["batch_stats"]["bn_0"]["mean"]), 0.5 * bmean, rtol=1e-5
    )

    sched = BNMomentumScheduler(lambda e: max(0.5 * 0.5 ** (e // 2), 0.01))
    assert sched.step(0) == pytest.approx(0.5)
    assert sched.step(4) == pytest.approx(1 - 0.125)
    assert sched.step(100) == pytest.approx(0.99)
