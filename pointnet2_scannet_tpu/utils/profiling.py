"""Profiling and tracing.

The reference's only instrumentation is manual wall-clock timers
(lib/solver.py:222-246, lib/dataset.py:62). Here:
  - StepTimer: the same fetch/step wall-clock accounting the Solver reports,
    as a reusable utility.
  - trace(): context manager around jax.profiler.trace — captures a TPU
    trace (HLO op timeline, memory viewer) viewable in TensorBoard/XProf.
  - device_memory_stats(): live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StepTimer:
    """Accumulates named wall-clock segments (fetch/forward/step/...)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def summary(self) -> dict[str, float]:
        return {k: self.mean(k) for k in self.totals}

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace: `with trace("outputs/run/trace"): step()`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> list[dict]:
    """Per-device memory stats (bytes_in_use etc.) where the backend
    supports it."""
    import jax

    out = []
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # noqa: BLE001 - not all backends implement it
            stats = {}
        out.append({"device": str(d), **stats})
    return out
