"""Headline benchmark: training throughput of the flagship PointNet++ SSG
config (batch 32 x 8192 points, xyz+color+normal — the reference's
50.48-mIoU recipe, scripts/train.py:110-128), plus the MSG config, the
whole-scene evaluator rate, and the audit numbers (step ms, model matmul
FLOPs, MFU) that make the headline checkable.

Prints ONE JSON line. Headline fields: metric/value/unit/vs_baseline
(SSG f32 points/sec vs the reference-on-3090 estimate derived in
BASELINE.md §"Throughput baseline derivation"). The headline measures the
train CLI's production dispatch mode (--fused_steps 8: K steps per fused
lax.scan program — identical per-step math, tested; removes per-step
dispatch latency). Extra fields:
  fused_steps          the fused-dispatch width the headline ran at
  step_ms              SSG f32 per-step latency in fused mode — MEDIAN of
                       train_repeats independently timed windows, with
                       *_min/*_max spread fields (single-draw train rows made
                       BENCH_r04's 2.2x f32 outlier undiagnosable)
  step_ms_per_dispatch / step_ms_bf16_per_dispatch  one-dispatch-per-step
                       latencies (the pre-fusion numbers, for audit)
  ssg_bf16_points_per_sec / step_ms_bf16   the bf16 compute-dtype config
  msg_points_per_sec / msg_bf16_points_per_sec   MSG config throughput
  model_tflops_fwd     analytic forward matmul FLOPs of the SSG model (TF)
  mfu_bf16             (3 x fwd matmul FLOPs) / bf16_step_time / 197e12 —
                       fraction of the v5e bf16 MXU peak the bf16 train step
                       sustains (matching dtypes: bf16 step over bf16 peak;
                       backward ~ 2x forward for matmuls; geometry ops and
                       BN/opt excluded, so this slightly UNDERSTATES true use)
  mfu_f32_over_bf16_peak  the f32 step against the SAME bf16 peak — NOT a
                       true f32 MFU (no official v5e f32 peak to divide by);
                       named to stay honest about the mixed units
  eval_scenes_per_sec  whole-scene evaluator rate on 100k-pt synthetic
                       scenes — MEDIAN of eval_repeats timed runs, with
                       eval_sps_min/max showing the spread (single draws
                       through the tunnel vary 6.4-7.9 on identical code)

`python bench.py --scale` additionally reports, as extra JSON lines: the
batch-size scaling study (B=64/128, f32+bf16 — the data a first real
multi-chip run needs, DESIGN.md §Batch scaling), the multiview recipes
(131 feature channels, the reference's best-mIoU configs), and chunk-size
scaling at constant points/step (DESIGN.md §Chunk-size scaling).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_POINTS_PER_SEC = 655_360.0  # derivation: BASELINE.md
V5E_BF16_PEAK = 197e12
BATCH = 32
FUSED = 8  # headline fused-dispatch width (the train CLI default --fused_steps)
NPOINTS = 8192
STEPS = 20
TRAIN_REPEATS = 3  # timed windows per train row; rows report median + min/max


def fwd_matmul_flops(spec, B: int, N: int) -> float:
    """Analytic forward matmul FLOPs (pointwise MLPs + head) of one batch."""
    pts = [N] + list(spec.npoints)
    f = 0.0
    cin_feats = spec.input_channels
    for lvl in range(len(spec.npoints)):
        M = spec.npoints[lvl]
        for s, widths in enumerate(spec.sa_mlps[lvl]):
            K = spec.nsamples[lvl][s]
            cin = cin_feats + (3 if spec.use_xyz else 0)
            for w in widths:
                f += 2.0 * B * M * K * cin * w
                cin = w
        cin_feats = sum(w[-1] for w in spec.sa_mlps[lvl])
    chans = list(spec.skip_channels)  # feature channels per level pre-FP
    cur = chans[-1]
    for lvl in reversed(range(len(spec.fp_mlps))):
        cin = cur + chans[lvl]
        for w in spec.fp_mlps[lvl]:
            f += 2.0 * B * pts[lvl] * cin * w
            cin = w
        cur = cin
    cin = cur
    for w in spec.cls_fc:
        f += 2.0 * B * N * cin * w
        cin = w
    f += 2.0 * B * N * cin * spec.num_classes
    return f


def time_train(
    model,
    steps: int = STEPS,
    batch_size: int = BATCH,
    fused: int = 1,
    npoints: int | None = None,
    repeats: int = 1,
) -> list[float]:
    """Per-step seconds for `repeats` independently timed windows (sorted).

    Callers take the MEDIAN as the settled number and report min/max as the
    spread: a single window through the tunnel can be skewed by one slow
    dispatch (BENCH_r04's 101 ms f32 draw vs r03's 46 ms on near-identical
    code was unattributable because the train rows were single-draw).

    fused > 1 measures the production fused-dispatch path (the train CLI's
    default --fused_steps: K steps per lax.scan program,
    parallel.step.make_fused_train_step) — same per-step math, one dispatch
    per K steps.
    """
    import jax

    from pointnet2_scannet_tpu.engine import train_state as ts
    from pointnet2_scannet_tpu.parallel import (
        batch_sharding,
        fused_batch_sharding,
        make_fused_train_step,
        make_mesh,
        make_parallel_train_step,
        replicated,
    )

    mesh = make_mesh()
    npoints = NPOINTS if npoints is None else npoints
    rng = np.random.default_rng(0)
    n_cols = 3 + model.spec.input_channels  # xyz + feature columns
    pc = rng.uniform(0.0, 1.5, size=(batch_size, npoints, n_cols)).astype(
        np.float32
    )
    tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 100))
    state = ts.create_train_state(model, jax.random.key(0), pc[:1], tx)
    raw_batch = {
        "points": pc,
        "labels": rng.integers(0, 20, size=(batch_size, npoints)).astype(np.int32),
        "weights": np.ones((batch_size, npoints), np.float32),
    }
    if fused > 1:
        raw_batch = {k: np.stack([v] * fused) for k, v in raw_batch.items()}
        shard = fused_batch_sharding(mesh) if mesh.size > 1 else None
    else:
        shard = batch_sharding(mesh) if mesh.size > 1 else None
    if mesh.size > 1:
        state = jax.device_put(state, replicated(mesh))
        batch = jax.device_put(raw_batch, shard)
        dropout_rng = jax.device_put(jax.random.key(2), replicated(mesh))
    else:
        state = jax.device_put(state)
        batch = jax.device_put(raw_batch)
        dropout_rng = jax.random.key(2)
    if fused > 1:
        step = make_fused_train_step(mesh, num_classes=20)
    else:
        step = make_parallel_train_step(mesh, num_classes=20)

    # warmup / compile. NOTE: fetch the loss value (not block_until_ready) —
    # the axon tunnel's block_until_ready returns before execution finishes.
    for _ in range(3):
        state, stats = step(state, batch, dropout_rng)
    float(np.asarray(stats["loss"]).reshape(-1)[-1])

    # at least 4 timed dispatches: with fused=8 and the default 20 steps the
    # quotient would be 2, and a single slow tunnel dispatch then skews the
    # mean by 25% (observed under host contention)
    calls = max(steps // fused, 4 if fused > 1 else 1)
    draws = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(calls):
            state, stats = step(state, batch, dropout_rng)
        float(np.asarray(stats["loss"]).reshape(-1)[-1])
        draws.append((time.perf_counter() - t0) / (calls * fused))
    return sorted(draws)


def eval_scenes_per_sec(n_scenes: int = 6, repeats: int = 3):
    """Median + per-draw scenes/sec over `repeats` timed evaluations: one
    draw through the tunnel spreads 6.4-7.9 on identical code (DESIGN.md
    eval part 3), so the headline reports the median with min/max so
    round-over-round deltas are attributable to code, not tunnel weather."""
    # one copy of the eval harness: scripts/bench_eval.py (it and this bench
    # had drifted when each carried its own)
    from scripts.bench_eval import measure

    med, _, draws = measure(n_scenes, repeats=repeats)
    return med, draws


def main(scale: bool = False, scale_only: bool = False) -> None:
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from pointnet2_scannet_tpu import models

    def med(draws: list[float]) -> float:
        return draws[len(draws) // 2]

    if scale_only:
        _scale_rows(models, jnp, med)
        return

    # eval first: its host-side pipeline (single-core metrics + producer
    # uploads) measures ~20% slower at the tail of this process (measured:
    # 7.9 standalone -> 5.9 after the eight train benches; jax.clear_caches
    # recovers only part). The train benches are device-side scan programs
    # and don't care about process history.
    eps, eps_draws = eval_scenes_per_sec()

    ssg = models.get_model(num_classes=20, is_msg=False, input_channels=6)
    # headline: the train CLI's production path (--fused_steps 8, K steps per
    # lax.scan program); per-dispatch numbers kept as audit fields. All train
    # rows are median-of-TRAIN_REPEATS windows with min/max spread (same
    # treatment the eval row got after its 6.4-7.9 single-draw variance).
    ssg_draws = time_train(ssg, fused=FUSED, repeats=TRAIN_REPEATS)
    ssg_step_s = med(ssg_draws)
    ssg_pps = BATCH * NPOINTS / ssg_step_s
    ssg_disp_draws = time_train(ssg, repeats=TRAIN_REPEATS)

    ssg_bf16 = models.get_model(
        num_classes=20, is_msg=False, input_channels=6, dtype=jnp.bfloat16
    )
    ssg_bf16_draws = time_train(ssg_bf16, fused=FUSED, repeats=TRAIN_REPEATS)
    ssg_bf16_step_s = med(ssg_bf16_draws)
    ssg_bf16_pps = BATCH * NPOINTS / ssg_bf16_step_s
    ssg_bf16_disp_draws = time_train(ssg_bf16, repeats=TRAIN_REPEATS)

    msg = models.get_model(num_classes=20, is_msg=True, input_channels=6)
    msg_draws = time_train(msg, fused=FUSED, repeats=TRAIN_REPEATS)
    msg_pps = BATCH * NPOINTS / med(msg_draws)
    msg_bf16 = models.get_model(
        num_classes=20, is_msg=True, input_channels=6, dtype=jnp.bfloat16
    )
    msg_bf16_draws = time_train(msg_bf16, fused=FUSED, repeats=TRAIN_REPEATS)
    msg_bf16_pps = BATCH * NPOINTS / med(msg_bf16_draws)

    flops_fwd = fwd_matmul_flops(ssg.spec, BATCH, NPOINTS)
    print(
        json.dumps(
            {
                "metric": "train_points_per_sec_ssg_b32_n8192",
                "value": round(ssg_pps, 1),
                "unit": "points/sec",
                "vs_baseline": round(ssg_pps / BASELINE_POINTS_PER_SEC, 3),
                "fused_steps": FUSED,
                "step_ms": round(ssg_step_s * 1e3, 2),
                "step_ms_min": round(ssg_draws[0] * 1e3, 2),
                "step_ms_max": round(ssg_draws[-1] * 1e3, 2),
                "step_ms_bf16": round(ssg_bf16_step_s * 1e3, 2),
                "step_ms_bf16_min": round(ssg_bf16_draws[0] * 1e3, 2),
                "step_ms_bf16_max": round(ssg_bf16_draws[-1] * 1e3, 2),
                "step_ms_per_dispatch": round(med(ssg_disp_draws) * 1e3, 2),
                "step_ms_per_dispatch_min": round(ssg_disp_draws[0] * 1e3, 2),
                "step_ms_per_dispatch_max": round(ssg_disp_draws[-1] * 1e3, 2),
                "step_ms_bf16_per_dispatch": round(
                    med(ssg_bf16_disp_draws) * 1e3, 2
                ),
                "ssg_bf16_points_per_sec": round(ssg_bf16_pps, 1),
                "msg_points_per_sec": round(msg_pps, 1),
                "msg_step_ms_min": round(msg_draws[0] * 1e3, 2),
                "msg_step_ms_max": round(msg_draws[-1] * 1e3, 2),
                "msg_bf16_points_per_sec": round(msg_bf16_pps, 1),
                "msg_bf16_step_ms_min": round(msg_bf16_draws[0] * 1e3, 2),
                "msg_bf16_step_ms_max": round(msg_bf16_draws[-1] * 1e3, 2),
                "train_repeats": TRAIN_REPEATS,
                "model_tflops_fwd": round(flops_fwd / 1e12, 4),
                "mfu_bf16": round(
                    3.0 * flops_fwd / ssg_bf16_step_s / V5E_BF16_PEAK, 4
                ),
                "mfu_f32_over_bf16_peak": round(
                    3.0 * flops_fwd / ssg_step_s / V5E_BF16_PEAK, 4
                ),
                "eval_scenes_per_sec": round(eps, 3),
                "eval_sps_min": round(min(eps_draws), 3),
                "eval_sps_max": round(max(eps_draws), 3),
                "eval_repeats": len(eps_draws),
            }
        )
    )

    if scale:
        _scale_rows(models, jnp, med)


def _scale_rows(models, jnp, med):
    """The --scale extra rows (batch-size / multiview / chunk-size studies);
    shared by --scale (after the headline) and --scale_only."""
    # batch-size scaling study (DESIGN.md §Batch scaling): the data the
    # first real multi-chip run needs
    for bs in (64, 128):
        for label, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            m = models.get_model(
                num_classes=20, is_msg=False, input_channels=6, dtype=dt
            )
            s = med(time_train(m, batch_size=bs, fused=FUSED, repeats=TRAIN_REPEATS))
            print(
                json.dumps(
                    {
                        "metric": f"scale_ssg_{label}_b{bs}",
                        "value": round(bs * NPOINTS / s, 1),
                        "unit": "points/sec",
                        "step_ms": round(s * 1e3, 2),
                    }
                )
            )
    # multiview recipes (xyz+normal+multiview = 131 feature channels —
    # the reference's best-mIoU configs, README.md:11-12): the heaviest
    # input the framework trains; exercises the wide-C SA1 grouping path
    for is_msg, name in ((False, "ssg"), (True, "msg")):
        for label, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            m = models.get_model(
                num_classes=20, is_msg=is_msg, input_channels=131, dtype=dt
            )
            s = med(time_train(m, fused=FUSED, repeats=TRAIN_REPEATS))
            print(
                json.dumps(
                    {
                        "metric": f"scale_{name}_mv131_{label}",
                        "value": round(BATCH * NPOINTS / s, 1),
                        "unit": "points/sec",
                        "step_ms": round(s * 1e3, 2),
                    }
                )
            )
    # chunk-size scaling at constant points/step (DESIGN.md §Chunk-size
    # scaling): bigger chunks amortize the sub-SA1 pyramid
    for npts, bs in ((16384, 16), (32768, 8)):
        for label, dt in (("f32", None), ("bf16", jnp.bfloat16)):
            m = models.get_model(
                num_classes=20, is_msg=False, input_channels=6, dtype=dt
            )
            s = med(
                time_train(
                    m, batch_size=bs, npoints=npts, fused=FUSED,
                    repeats=TRAIN_REPEATS,
                )
            )
            print(
                json.dumps(
                    {
                        "metric": f"scale_ssg_{label}_b{bs}_n{npts}",
                        "value": round(bs * npts / s, 1),
                        "unit": "points/sec",
                        "step_ms": round(s * 1e3, 2),
                    }
                )
            )


if __name__ == "__main__":
    import sys

    main(
        scale="--scale" in sys.argv,
        scale_only="--scale_only" in sys.argv,
    )
