"""Reference-checkpoint converter: a synthetic state_dict with the exact
reference naming/shapes must map onto the flax model and run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointnet2_scannet_tpu import models
from pointnet2_scannet_tpu.models.convert import convert_torch_pointnet2

RNG = np.random.default_rng(0)


def fake_reference_state_dict(spec):
    """Build a state_dict with the reference's key scheme and shapes
    (pytorch_utils.py SharedMLP/Conv naming, pointnet2_semseg.py layout)."""
    sd = {}

    def add_block(prefix, cin, cout, conv_rank):
        ones = (1,) * conv_rank
        sd[f"{prefix}.conv.weight"] = RNG.normal(size=(cout, cin) + ones).astype(
            np.float32
        )
        sd[f"{prefix}.bn.bn.weight"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bn.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.bn.running_mean"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.bn.bn.running_var"] = np.ones(cout, np.float32)
        sd[f"{prefix}.bn.bn.num_batches_tracked"] = np.asarray(0)

    cin_level = spec.input_channels
    for k, level in enumerate(spec.sa_mlps):
        cout_level = 0
        for s, widths in enumerate(level):
            cin = cin_level + (3 if spec.use_xyz else 0)
            for i, w in enumerate(widths):
                add_block(f"SA_modules.{k}.mlps.{s}.layer{i}", cin, w, 2)
                cin = w
            cout_level += widths[-1]
        cin_level = cout_level

    skips = spec.skip_channels
    for k, widths in enumerate(spec.fp_mlps):
        pre = spec.fp_mlps[k + 1][-1] if k + 1 < len(spec.fp_mlps) else cin_level
        cin = pre + skips[k]
        for i, w in enumerate(widths):
            add_block(f"FP_modules.{k}.mlp.layer{i}", cin, w, 2)
            cin = w

    add_block("cls_layer.0", spec.fp_mlps[0][-1], spec.cls_fc[0], 1)
    add_block("cls_layer.2", spec.cls_fc[0], spec.num_classes, 1)
    return sd


@pytest.mark.parametrize("is_msg", [False, True])
def test_convert_matches_flax_template(is_msg):
    spec = (models.msg_spec if is_msg else models.ssg_spec)(20, 6)
    sd = fake_reference_state_dict(spec)
    variables = convert_torch_pointnet2(sd, spec)

    model = models.PointNet2SemSeg(spec=spec)
    pc = jnp.asarray(RNG.uniform(0, 1.5, (1, 2048, 9)).astype(np.float32))
    template = jax.jit(lambda: model.init(jax.random.key(0), pc, train=False))()

    # every leaf present with matching shape
    t_flat = jax.tree_util.tree_leaves_with_path(template["params"])
    c_flat = dict(
        (jax.tree_util.keystr(p), l)
        for p, l in jax.tree_util.tree_leaves_with_path(variables["params"])
    )
    assert len(t_flat) == len(c_flat)
    for path, leaf in t_flat:
        key = jax.tree_util.keystr(path)
        assert key in c_flat, key
        assert c_flat[key].shape == leaf.shape, (key, c_flat[key].shape, leaf.shape)

    # and the converted variables actually run through the model
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}, pc
    )
    assert logits.shape == (1, 2048, 20)
    assert np.isfinite(np.asarray(logits)).all()


def test_unconsumed_keys_raise():
    spec = models.ssg_spec(20, 0)
    sd = fake_reference_state_dict(spec)
    sd["SA_modules.9.bogus"] = np.zeros(3)
    with pytest.raises(ValueError, match="unconsumed"):
        convert_torch_pointnet2(sd, spec)


class TestReverseExport:
    """export_torch_pointnet2: flax -> reference state_dict (interop runs
    both directions)."""

    @pytest.mark.parametrize("is_msg", [False, True], ids=["ssg", "msg"])
    def test_roundtrip_exact(self, is_msg):
        from pointnet2_scannet_tpu.models.convert import export_torch_pointnet2

        spec = (models.msg_spec if is_msg else models.ssg_spec)(20, 6)
        model = models.PointNet2SemSeg(spec=spec)
        pc = np.zeros((1, 1024, 9), np.float32)
        variables = model.init(jax.random.key(3), pc, train=False)
        variables = jax.tree_util.tree_map(np.asarray, dict(variables))
        sd = export_torch_pointnet2(variables, spec)
        back = convert_torch_pointnet2(dict(sd), spec)
        for col in ("params", "batch_stats"):
            a = dict(jax.tree_util.tree_flatten_with_path(variables[col])[0])
            b = dict(jax.tree_util.tree_flatten_with_path(back[col])[0])
            assert a.keys() == b.keys()
            for path in a:
                np.testing.assert_array_equal(
                    np.asarray(a[path]), np.asarray(b[path]),
                    err_msg=jax.tree_util.keystr(path),
                )

    def test_loads_into_reference_model(self):
        """The exported dict must load_state_dict(strict=True) into the real
        reference model and produce OUR logits."""
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, "tests")
        from tests.torch_ref import load_reference_modules

        mods = load_reference_modules()
        from pointnet2_scannet_tpu.models.convert import export_torch_pointnet2

        spec = models.ssg_spec(20, 6)
        model = models.PointNet2SemSeg(spec=spec)
        rng = np.random.default_rng(5)
        pc = rng.uniform(-1.5, 1.5, (2, 1024, 9)).astype(np.float32)
        variables = model.init(jax.random.key(1), pc[:1], train=False)
        variables = jax.tree_util.tree_map(np.asarray, dict(variables))
        sd = export_torch_pointnet2(variables, spec)

        tmodel = mods["semseg"].get_model(
            num_classes=20, is_msg=False, input_channels=6, use_xyz=True, bn=True
        )
        missing, unexpected = tmodel.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            strict=True,
        )
        assert not missing and not unexpected
        tmodel.eval()
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(pc)).numpy()
        ours = np.asarray(
            jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, pc)
        )
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)
        agree = np.mean(np.argmax(ours, -1) == np.argmax(ref, -1))
        assert agree > 0.999, agree
