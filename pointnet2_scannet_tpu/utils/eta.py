"""ETA helpers (reference: lib/utils.py:1-28)."""

from __future__ import annotations


def get_eta(fetch_mean, forward_mean, backward_mean, iters_left) -> dict:
    seconds = (fetch_mean + forward_mean + backward_mean) * iters_left
    return decode_eta(seconds)


def decode_eta(seconds: float) -> dict:
    seconds = int(seconds)
    return {
        "h": seconds // 3600,
        "m": (seconds % 3600) // 60,
        "s": seconds % 60,
    }
