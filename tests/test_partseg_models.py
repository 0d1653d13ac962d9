"""PointNet++ part-segmentation family (beyond-reference model family).

Built from the same SetAbstraction/FeaturePropagation/PointwiseMLP blocks as
the semantic-segmentation models; these tests pin forward shapes, jit/grad
viability, category-conditioning behavior, and that the SSG part segmenter
actually learns the synthetic part labels within a bounded number of steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pointnet2_scannet_tpu.data.shapes import (
    num_parts_total,
    sample_partseg_batch,
)
from pointnet2_scannet_tpu.models import get_partseg_model

B, N, K = 4, 512, 3
P = num_parts_total(K)


@pytest.mark.parametrize("is_msg", [False, True])
@pytest.mark.slow
def test_forward_shapes_and_grad(is_msg):
    model = get_partseg_model(P, K, is_msg=is_msg)
    batch = sample_partseg_batch(np.random.default_rng(0), B, N, K)
    pc = jnp.asarray(batch["points"])
    variables = model.init(jax.random.key(0), pc, train=False)
    logits = model.apply(variables, pc, train=False)
    assert logits.shape == (B, N, P)
    assert logits.dtype == jnp.float32

    def loss(params):
        out = model.apply(
            {**variables, "params": params},
            pc,
            train=True,
            rngs={"dropout": jax.random.key(1)},
            mutable=["batch_stats"],
        )[0]
        return jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                out, jnp.asarray(batch["labels"])
            )
        )

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_category_onehot_conditions_output():
    """Flipping the category one-hot changes the logits: the conditioning
    channels reach the head (through the final FP skip)."""
    model = get_partseg_model(P, K)
    batch = sample_partseg_batch(np.random.default_rng(1), 2, N, K)
    pc = np.asarray(batch["points"]).copy()
    variables = model.init(jax.random.key(0), jnp.asarray(pc), train=False)
    out_a = model.apply(variables, jnp.asarray(pc), train=False)
    flipped = pc.copy()
    flipped[..., 3:] = np.roll(flipped[..., 3:], 1, axis=-1)
    out_b = model.apply(variables, jnp.asarray(flipped), train=False)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


@pytest.mark.slow
def test_ssg_learns_synthetic_parts():
    """Sphere/cube parts (hemispheres, z-faces vs sides) to high accuracy in
    a bounded number of Adam steps — proof the family trains, not just runs."""
    n_cats = 2
    n_parts = num_parts_total(n_cats)
    model = get_partseg_model(n_parts, n_cats)
    rng = np.random.default_rng(2)
    batch0 = sample_partseg_batch(rng, 8, N, n_cats)
    variables = model.init(jax.random.key(0), jnp.asarray(batch0["points"]), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, pts, labels, key):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                pts,
                train=True,
                rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            l = jnp.mean(
                optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            )
            return l, updates["batch_stats"]

        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state2 = tx.update(g, opt_state)
        return optax.apply_updates(params, upd), bs, opt_state2, l

    # calibration (seed 0 run): eval acc 0.29 @ step 20, 0.53 @ 30, 0.80 @ 50,
    # 0.91 @ 60 — eval lags train because the BN running stats settle
    # layer-by-layer; 70 steps leaves seed margin over the 0.85 gate
    first = None
    for i in range(70):
        b = sample_partseg_batch(rng, 8, N, n_cats)
        params, batch_stats, opt_state, l = step(
            params,
            batch_stats,
            opt_state,
            jnp.asarray(b["points"]),
            jnp.asarray(b["labels"]),
            jax.random.key(i),
        )
        if first is None:
            first = float(l)
    val = sample_partseg_batch(np.random.default_rng(99), 8, N, n_cats, augment=False)
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(val["points"]),
        train=False,
    )
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == val["labels"]))
    assert float(l) < first * 0.5, (first, float(l))
    assert acc >= 0.85, acc
