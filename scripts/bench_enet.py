"""ENet multiview feature-extraction throughput (frames/sec).

The offline multiview stage-1 rate (scripts/multiview.py; reference
scripts/compute_multiview_features.py batches 256 frames through the frozen
encoder). Times the jitted ENetEncoder forward at the production frame shape
(256x328 RGB -> 128x32x41 features) with the scan-loop harness
(scripts/bench_hotops.py methodology: device-side loop, scalar bleed between
iterations, full output reduced into the carry, one scalar fetched).

Weights are random-initialized — identical FLOPs/layout to the shipped
scannetv2_enet.pth; this measures throughput, not features.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPS = 10


def bench_encoder(batch_size: int, dtype_name: str) -> float:
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.models.enet import ENetEncoder

    model = ENetEncoder()
    frames = np.random.default_rng(0).uniform(
        -2, 2, (batch_size, 256, 328, 3)
    ).astype(np.float32)
    variables = jax.jit(lambda: model.init(jax.random.key(0), frames[:1]))()
    x = jnp.asarray(frames)
    if dtype_name == "bf16":
        x = x.astype(jnp.bfloat16)
        variables = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16)
            if isinstance(v, jnp.ndarray) and v.dtype == jnp.float32
            else v,
            variables,
        )

    def run(variables, x):
        def body(acc, _):
            out = model.apply(variables, x + acc.astype(x.dtype) * 1e-20)
            return jnp.sum(out).astype(jnp.float32) * 1e-20 + acc, None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return acc

    fn = jax.jit(run)
    float(np.asarray(fn(variables, x)))  # compile + settle
    t0 = time.perf_counter()
    float(np.asarray(fn(variables, x)))
    dt = (time.perf_counter() - t0) / REPS
    return batch_size / dt


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    f32 = bench_encoder(batch_size, "f32")
    bf16 = bench_encoder(batch_size, "bf16")
    print(
        json.dumps(
            {
                "metric": "enet_feature_extraction_frames_per_sec",
                "value": round(f32, 1),
                "unit": "frames/sec",
                "bf16_frames_per_sec": round(bf16, 1),
                "detail": f"B={batch_size} 256x328 RGB -> 128x32x41, single chip",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
