"""Class-weighted cross-entropy (reference: lib/loss.py:5-18).

The reference computes F.cross_entropy(reduction="none") per point, scales by
the precomputed per-point weights (labelweights[label] * mask from the
dataset), and takes the MEAN over all points — including zero-weight ones.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def softmax_ce_integer(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-point softmax cross-entropy with integer labels, scatter-free.

    Numerically identical to optax.softmax_cross_entropy_with_integer_labels
    (same max-shift formulation), but the label logit is picked with a
    broadcast-compare one-hot multiply-sum instead of take_along_axis: the
    gather over the tiny class axis and — worse — its scatter-add transpose in
    the backward pass are pathological on TPU at B*N=262k points. The one-hot
    product is exact (1.0 * x, zeros elsewhere), and the VJP is the dense
    `softmax - onehot`, keeping the whole loss gradient on the VPU.
    """
    shifted = logits - lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)
    )
    onehot = (
        labels[..., None]
        == lax.broadcasted_iota(jnp.int32, shifted.shape, shifted.ndim - 1)
    ).astype(shifted.dtype)
    label_logits = jnp.sum(shifted * onehot, axis=-1)
    log_normalizers = jnp.log(jnp.sum(jnp.exp(shifted), axis=-1))
    return log_normalizers - label_logits


def weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    row_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean over all points of per-point CE * weight.

    Args:
      logits: (B, N, num_classes) float.
      labels: (B, N) int32 in [0, num_classes).
      weights: (B, N) float per-point weights.
      row_mask: optional (B,) 0/1 marks of real (non-padding) batch rows;
        the mean is taken over real rows only, so a padded trailing batch
        produces the same loss the reference's ragged batch would.
    """
    ce = softmax_ce_integer(logits, labels)
    if row_mask is None:
        return jnp.mean(ce * weights)
    m = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * ce.shape[-1]
    return jnp.sum(ce * weights * m) / denom


def weighted_cross_entropy_sharded(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    row_mask: jnp.ndarray | None,
    axis_name: str,
) -> jnp.ndarray:
    """weighted_cross_entropy over a batch sharded along `axis_name`
    (shard_map): per-shard sums psum'd so the value equals the global-batch
    mean (up to reduction order). Differentiating through the psums yields
    the correct global-mean gradients on every shard."""
    ce = softmax_ce_integer(logits, labels)
    if row_mask is None:
        num = lax.psum(jnp.sum(ce * weights), axis_name)
        cnt = lax.psum(jnp.float32(ce.size), axis_name)
        return num / cnt
    m = row_mask[:, None]
    num = lax.psum(jnp.sum(ce * weights * m), axis_name)
    rows = jnp.maximum(lax.psum(jnp.sum(row_mask), axis_name), 1.0)
    return num / (rows * ce.shape[-1])
