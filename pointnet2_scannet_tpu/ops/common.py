"""Shared geometry helpers for the point-cloud ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def on_tpu_backend() -> bool:
    """True on real TPU backends ('tpu', or 'axon' = tunneled v5e).

    The single gate every Pallas auto-selection consults — adding a new
    backend name here routes all kernels at once.
    """
    return jax.default_backend() in ("tpu", "axon")


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray, *, mode: str = "exact") -> jnp.ndarray:
    """Squared Euclidean distances between two point sets.

    Args:
      a: (..., M, 3) float array.
      b: (..., N, 3) float array.
      mode: "exact" computes sum_k (a_k - b_k)^2 per coordinate (bit-comparable
        to the reference CUDA kernels' elementwise form, e.g.
        ball_query_gpu.cu:31-32); "dot" uses the |a|^2 - 2ab + |b|^2 matmul
        identity which rides the MXU but can go slightly negative / lose ~1 ulp.

    Returns:
      (..., M, N) squared distances.
    """
    if mode == "dot":
        a2 = jnp.sum(a * a, axis=-1)[..., :, None]
        b2 = jnp.sum(b * b, axis=-1)[..., None, :]
        ab = jnp.einsum("...mk,...nk->...mn", a, b)
        return a2 + b2 - 2.0 * ab
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    d2 = jnp.zeros(a.shape[:-2] + (a.shape[-2], b.shape[-2]), a.dtype)
    for k in range(3):
        diff = a[..., :, None, k] - b[..., None, :, k]
        d2 = d2 + diff * diff
    return d2
