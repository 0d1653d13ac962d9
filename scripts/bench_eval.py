"""Whole-scene evaluation throughput benchmark (BASELINE.md row:
"Whole-scene eval scenes/sec — reported alongside").

Tiles synthetic scenes and measures end-to-end scenes/sec through the
WholeSceneEvaluator (forward + argmax + metrics), printing one JSON line.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(n_scenes: int = 4, batch_size: int = 16, repeats: int = 1):
    """Shared eval-throughput harness (also the driver bench's
    eval_scenes_per_sec — one copy, bench.py imports this). Returns
    (median_scenes_per_sec, report, draws) where draws is the list of all
    per-repeat scenes/sec values. Same-code runs through the tunnel spread
    6.4-7.9 scenes/sec (DESIGN.md eval part 3), so a single draw is mostly
    link weather — repeats>=3 + median makes round-over-round comparisons
    attributable to code."""
    import jax

    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import DataConfig
    from pointnet2_scannet_tpu.data.synthetic import make_synthetic_store
    from pointnet2_scannet_tpu.data.wholescene import WholeSceneDataset
    from pointnet2_scannet_tpu.engine.evaluator import WholeSceneEvaluator

    store = make_synthetic_store(n_scenes, n_points=100_000)
    ds = WholeSceneDataset(
        store, DataConfig(npoints=8192, use_color=True, use_normal=True), seed=0
    )
    model = models.get_model(20, is_msg=False, input_channels=6)
    rng = np.random.default_rng(0)
    pc = rng.uniform(0, 1.5, (1, 8192, 9)).astype(np.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc, train=False))()
    ev = WholeSceneEvaluator(model.apply, variables, batch_size=batch_size)

    # warm up the index-streaming compiles on a one-scene dataset
    warm = WholeSceneDataset(
        make_synthetic_store(1, n_points=100_000),
        DataConfig(npoints=8192, use_color=True, use_normal=True),
        seed=0,
    )
    ev.evaluate(warm, verbose=False)

    draws = []
    report = None
    for _ in range(max(repeats, 1)):
        t0 = time.perf_counter()
        report = ev.evaluate(ds, verbose=False)
        draws.append(n_scenes / (time.perf_counter() - t0))
    return float(np.median(draws)), report, draws


def main(n_scenes: int = 4) -> None:
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sps, report, draws = measure(n_scenes, repeats=3)
    print(
        json.dumps(
            {
                "metric": "wholescene_eval_scenes_per_sec",
                "value": round(sps, 3),
                "unit": "scenes/sec",
                "eval_sps_min": round(min(draws), 3),
                "eval_sps_max": round(max(draws), 3),
                "eval_repeats": len(draws),
                "detail": f"{n_scenes} synthetic 100k-pt scenes, point_acc {report.point_acc:.3f}",
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
