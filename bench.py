"""Headline benchmark (measured 2026-08-16 on the single v5e chip:
3.98M points/sec f32 SSG = 6.08x the reference baseline estimate.)

Original docstring: training throughput (points/sec) of the flagship
PointNet++ SSG config (batch 32 x 8192 points, xyz+color+normal — the
reference's 50.48-mIoU recipe, scripts/train.py:110-128).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md), so
the baseline is an estimate of the reference CUDA pipeline's full-iteration
rate on its training GPU (RTX 3090): PointNet++ SSG fwd+bwd at batch 32x8192
runs around 2.5 it/s on a 3090, and the reference additionally syncs
device->host and voxelizes metrics with numpy EVERY iteration
(lib/solver.py:225,327-347), roughly halving that in practice. We use the
kernel-only 2.5 it/s figure (no metric-sync penalty) as a conservative
baseline: 32 * 8192 * 2.5 = 655,360 points/sec.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 655_360.0
BATCH = 32
NPOINTS = 8192
STEPS = 20


def main() -> None:
    import jax

    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.engine import train_state as ts
    from pointnet2_scannet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        make_parallel_train_step,
        replicated,
    )

    mesh = make_mesh()  # all available devices, data-parallel
    model = models.get_model(num_classes=20, is_msg=False, input_channels=6)

    rng = np.random.default_rng(0)
    pc = rng.uniform(0.0, 1.5, size=(BATCH, NPOINTS, 9)).astype(np.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc[:1], train=False))()
    del variables  # create_train_state re-inits; this warms nothing

    tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 100))
    state = ts.create_train_state(model, jax.random.key(0), pc[:1], tx)
    raw_batch = {
        "points": pc,
        "labels": rng.integers(0, 20, size=(BATCH, NPOINTS)).astype(np.int32),
        "weights": np.ones((BATCH, NPOINTS), np.float32),
    }
    if mesh.size > 1:
        state = jax.device_put(state, replicated(mesh))
        batch = jax.device_put(raw_batch, batch_sharding(mesh))
        dropout_rng = jax.device_put(jax.random.key(2), replicated(mesh))
    else:
        state = jax.device_put(state)
        batch = jax.device_put(raw_batch)
        dropout_rng = jax.random.key(2)
    step = make_parallel_train_step(mesh, num_classes=20)

    # warmup / compile. NOTE: fetch the loss value (not block_until_ready) —
    # the axon tunnel backend's block_until_ready returns before execution
    # finishes, which would make the timing meaningless.
    for _ in range(3):
        state, stats = step(state, batch, dropout_rng)
    float(np.asarray(stats["loss"]))

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, stats = step(state, batch, dropout_rng)
    float(np.asarray(stats["loss"]))
    dt = time.perf_counter() - t0

    pps = BATCH * NPOINTS * STEPS / dt
    print(
        json.dumps(
            {
                "metric": "train_points_per_sec_ssg_b32_n8192",
                "value": round(pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
