"""PointNet++ classification heads (beyond-reference model family).

Built from the same SetAbstraction/FC blocks as the segmentation models;
these tests pin forward shapes, jit/grad viability, determinism of eval
mode, and that the SSG classifier actually separates two trivially
separable synthetic shape classes within a few optimizer steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from pointnet2_scannet_tpu.models import get_cls_model

B, N = 4, 1024


def _clouds(rng, n=B, kind=0):
    """kind 0 = unit sphere surface, kind 1 = cube surface: trivially
    separable by radius statistics."""
    pts = rng.normal(size=(n, N, 3)).astype(np.float32)
    if kind == 0:
        pts /= np.linalg.norm(pts, axis=-1, keepdims=True)
    else:
        pts = rng.uniform(-1, 1, (n, N, 3)).astype(np.float32)
        ax = rng.integers(0, 3, (n, N))
        sign = rng.choice([-1.0, 1.0], (n, N))
        np.put_along_axis(pts, ax[..., None], sign[..., None], axis=-1)
    return pts + np.float32(2.0)  # shift off origin (FPS origin-skip quirk)


@pytest.mark.parametrize("is_msg", [False, True])
@pytest.mark.slow
def test_forward_shapes_and_grad(is_msg):
    model = get_cls_model(num_classes=7, is_msg=is_msg)
    rng = np.random.default_rng(0)
    pc = jnp.asarray(_clouds(rng))
    variables = model.init(jax.random.key(0), pc, train=False)
    logits = model.apply(variables, pc, train=False)
    assert logits.shape == (B, 7)
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
                out, jnp.zeros(B, jnp.int32)
            )
        )

    g = jax.jit(jax.grad(loss))(variables["params"])
    assert all(
        bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g)
    )


def test_eval_mode_deterministic():
    model = get_cls_model(num_classes=3)
    rng = np.random.default_rng(1)
    pc = jnp.asarray(_clouds(rng))
    variables = model.init(jax.random.key(0), pc, train=False)
    a = model.apply(variables, pc, train=False)
    b = model.apply(variables, pc, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_ssg_separates_sphere_from_cube():
    model = get_cls_model(num_classes=2)
    rng = np.random.default_rng(2)
    pc = jnp.asarray(
        np.concatenate([_clouds(rng, 4, kind=0), _clouds(rng, 4, kind=1)])
    )
    labels = jnp.asarray(np.array([0] * 4 + [1] * 4, np.int32))
    variables = model.init(jax.random.key(0), pc, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, key):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                pc,
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

    # eval-mode accuracy needs the BN RUNNING stats to converge through the
    # whole depth (layer k's stats settle only after k-1's do): train-mode
    # accuracy hits 1.0 by step ~10 but eval flips at ~step 70
    first = None
    for i in range(90):
        params, batch_stats, opt_state, l = step(
            params, batch_stats, opt_state, jax.random.key(i)
        )
        if first is None:
            first = float(l)
    logits = model.apply(
        {"params": params, "batch_stats": batch_stats}, pc, train=False
    )
    acc = float(jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)))
    assert float(l) < first * 0.7, (first, float(l))
    assert acc >= 0.875, acc
