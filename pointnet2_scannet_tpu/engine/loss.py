"""Class-weighted cross-entropy (reference: lib/loss.py:5-18).

The reference computes F.cross_entropy(reduction="none") per point, scales by
the precomputed per-point weights (labelweights[label] * mask from the
dataset), and takes the MEAN over all points — including zero-weight ones.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


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
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if row_mask is None:
        return jnp.mean(ce * weights)
    m = row_mask[:, None]
    denom = jnp.maximum(jnp.sum(row_mask), 1.0) * ce.shape[-1]
    return jnp.sum(ce * weights * m) / denom
