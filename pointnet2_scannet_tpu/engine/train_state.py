"""Functional train state and the jitted train/eval steps.

Replaces the reference Solver's imperative forward/backward
(lib/solver.py:155-181) with a pure step function: (state, batch, rng) ->
(state, stats). The optimizer recipe matches scripts/train.py:36-47 +
lib/solver.py:73 — Adam(lr, wd) with a StepLR-style staircase decay
(exponential_decay with staircase=True, stepped per epoch).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state

from pointnet2_scannet_tpu.engine.loss import (
    softmax_ce_integer,
    weighted_cross_entropy,
    weighted_cross_entropy_sharded,
)
from pointnet2_scannet_tpu.engine.metrics import confusion_matrix


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


def make_lr_schedule(
    lr: float, decay_step_epochs: int, decay_factor: float, steps_per_epoch: int
) -> optax.Schedule:
    """StepLR(decay_step, gamma) equivalent, stepped at epoch boundaries."""
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=max(decay_step_epochs * steps_per_epoch, 1),
        decay_rate=decay_factor,
        staircase=True,
    )


def make_optimizer(
    lr: float | optax.Schedule, weight_decay: float = 0.0
) -> optax.GradientTransformation:
    """Adam with torch-style (coupled L2) weight decay."""
    if weight_decay > 0:
        # torch Adam folds wd*param into the gradient BEFORE the moment
        # updates; add_decayed_weights upstream of adam reproduces that.
        return optax.chain(
            optax.add_decayed_weights(weight_decay), optax.adam(lr)
        )
    return optax.adam(lr)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jnp.ndarray,
    tx: optax.GradientTransformation,
) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", flax.core.freeze({})),
        tx=tx,
    )


def train_step(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    dropout_rng: jax.Array,
    *,
    num_classes: int,
    axis_name: str | None = None,
) -> tuple[TrainState, dict[str, jnp.ndarray]]:
    """One optimization step. Returns (new_state, stats) where stats holds the
    scalar loss and the on-device confusion matrix for this batch.

    axis_name: set when running inside shard_map over a data-parallel mesh
    axis — the loss/metrics are psum'd to global-batch values, dropout keys
    are folded with the device index, and gradients come out globally correct
    by differentiating through the psums. The model must then be built with
    bn_axis_name=axis_name so train-time BN also normalizes globally."""
    rng = jax.random.fold_in(dropout_rng, state.step)
    if axis_name is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))

    def loss_fn(params):
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["points"],
            train=True,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        if axis_name is None:
            loss = weighted_cross_entropy(
                logits, batch["labels"], batch["weights"], batch.get("row_mask")
            )
        else:
            loss = weighted_cross_entropy_sharded(
                logits,
                batch["labels"],
                batch["weights"],
                batch.get("row_mask"),
                axis_name,
            )
        return loss, (logits, mutated["batch_stats"])

    (loss, (logits, new_batch_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if axis_name is not None:
        # inside shard_map, differentiating the psum'd loss gives each device
        # only ITS shard's contribution to the global gradient (psum's
        # transpose broadcasts the cotangent; it does not sum the grads) —
        # the global gradient is the psum of the contributions. Without this
        # every chip would apply a different gradient and params would
        # silently diverge.
        grads = jax.lax.psum(grads, axis_name)
    state = state.apply_gradients(grads=grads)
    state = state.replace(batch_stats=new_batch_stats)
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, batch["labels"], num_classes, batch.get("row_mask"))
    if axis_name is not None:
        cm = jax.lax.psum(cm, axis_name)
    return state, {"loss": loss, "confusion": cm}


def grad_accum_step(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    dropout_rng: jax.Array,
    micro_idx: jnp.ndarray,
    *,
    num_classes: int,
    axis_name: str | None = None,
):
    """One micro-batch of a gradient-accumulated step (whole-scene training,
    the reference's --use_wholescene path: ONE optimizer update per scene,
    forward over the scene's column stack in fixed-size chunks,
    lib/solver.py:155-169).

    Returns (grads_of_loss_SUM, new_batch_stats, loss_sum, point_count, cm);
    the caller accumulates across micro-batches and applies one update with
    grads scaled by 1/total_points (grad of the mean).

    axis_name: set when running inside shard_map over a dp mesh axis — the
    sum-gradients/loss/count/cm are psum'd to global values (the model must
    then be built with bn_axis_name=axis_name, like train_step).
    """
    rng = jax.random.fold_in(jax.random.fold_in(dropout_rng, state.step), micro_idx)
    if axis_name is not None:
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
    row_mask = batch.get("row_mask")
    if row_mask is None:
        row_mask = jnp.ones(batch["labels"].shape[0], jnp.float32)

    def loss_sum_fn(params):
        # row_mask flows into the model so BatchNorm's batch statistics
        # exclude the zero-padded trailing rows exactly (MaskedBatchNorm) —
        # matching the reference's unpadded ragged micro-batches
        logits, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["points"],
            train=True,
            row_mask=row_mask,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        ce = softmax_ce_integer(logits, batch["labels"])
        loss_sum = jnp.sum(ce * batch["weights"] * row_mask[:, None])
        return loss_sum, (logits, mutated["batch_stats"])

    (loss_sum, (logits, new_batch_stats)), grads = jax.value_and_grad(
        loss_sum_fn, has_aux=True
    )(state.params)
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, batch["labels"], num_classes, row_mask)
    count = jnp.sum(row_mask) * batch["labels"].shape[-1]
    if axis_name is not None:
        # sum-loss gradients: each shard's grad of ITS loss_sum contribution;
        # the global sum-gradient is the psum (batch_stats already sync via
        # the model's bn_axis_name pmean, so they come out replicated)
        grads = jax.lax.psum(grads, axis_name)
        loss_sum = jax.lax.psum(loss_sum, axis_name)
        count = jax.lax.psum(count, axis_name)
        cm = jax.lax.psum(cm, axis_name)
    return grads, new_batch_stats, loss_sum, count, cm


def apply_accumulated(state: TrainState, grads_sum, total_count: jnp.ndarray) -> TrainState:
    """Apply one optimizer update from accumulated sum-gradients."""
    grads = jax.tree_util.tree_map(lambda g: g / total_count, grads_sum)
    return state.apply_gradients(grads=grads)


def eval_step(
    state: TrainState,
    batch: dict[str, jnp.ndarray],
    *,
    num_classes: int,
    axis_name: str | None = None,
) -> dict[str, jnp.ndarray]:
    """Forward-only validation step (running BN stats, no dropout).

    axis_name: set inside shard_map over a dp axis — loss/confusion psum to
    global-batch values; preds stay batch-sharded. (BN uses running averages
    here, so no cross-device stat sync is involved.)"""
    logits = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["points"],
        train=False,
    )
    if axis_name is None:
        loss = weighted_cross_entropy(
            logits, batch["labels"], batch["weights"], batch.get("row_mask")
        )
    else:
        loss = weighted_cross_entropy_sharded(
            logits,
            batch["labels"],
            batch["weights"],
            batch.get("row_mask"),
            axis_name,
        )
    preds = jnp.argmax(logits, axis=-1)
    cm = confusion_matrix(preds, batch["labels"], num_classes, batch.get("row_mask"))
    if axis_name is not None:
        cm = jax.lax.psum(cm, axis_name)
    return {"loss": loss, "confusion": cm, "preds": preds}


def predict_logits(state: TrainState, points: jnp.ndarray) -> jnp.ndarray:
    """Inference forward pass: (B, N, 3+C) -> (B, N, num_classes)."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        points,
        train=False,
    )
