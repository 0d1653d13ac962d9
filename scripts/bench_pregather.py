"""Measure the pregather layer-0 composition at the wide-channel recipes.

Two questions, answered per dtype (f32/bf16), scan-loop harness (CLAUDE.md
microbenchmark rules: loops not single calls, scalar-only fetches):

1. SA1-block forward: grouped-gather + Dense0 (unfused) vs pregather
   (Dense0 at source resolution + w0-channel gather + 3-channel centered
   xyz gather). The gather's cost scales with its channel count
   (ops/pallas/vmem_gather_kernel.py), so at C_in=134 vs w0=32 the fwd
   should win ~4x on gather work.
2. Whole train step at the mv131 recipe (B=32 x 8192): does the win
   survive the backward (pregather adds a live (B,J,w0)->(B,N,w0)
   scatter-add for dz that the unfused path does not have)?

Usage: python scripts/bench_pregather.py [--quick]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache


def _scan_time(fn, *args, iters=10, warmup=2):
    """Seconds per call; fn must return a scalar-reducible output."""
    import jax

    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    float(np.asarray(out).reshape(-1)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(np.asarray(out).reshape(-1)[-1])
    return (time.perf_counter() - t0) / iters


def bench_sa1_block(dtype_name: str, quick: bool):
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.models.modules import SetAbstraction
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    B, N, C = (8, 8192, 131) if quick else (32, 8192, 131)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(0, 1.5, (B, N, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    sa = SetAbstraction(
        npoint=1024, radii=[0.1], nsamples=[32], mlps=[[32, 32, 64]],
        use_xyz=True, dtype=dt,
    )
    for flag, label in ((False, "unfused"), (True, "pregather")):
        ops_config.pregather_dense = flag
        variables = sa.init(jax.random.key(0), xyz, feats, train=False)

        def fwd(v, x, f):
            ops_config.pregather_dense = flag  # trace-time switch
            _, h, _ = sa.apply(v, x, f, train=False)
            return jnp.sum(h.astype(jnp.float32))

        s = _scan_time(fwd, variables, xyz, feats)
        print(f"sa1_mv131 {dtype_name} {label:10s} fwd {s * 1e3:8.2f} ms")

        def fwdbwd(v, x, f):
            ops_config.pregather_dense = flag

            def loss(vv, ff):
                _, h, _ = sa.apply(vv, x, ff, train=False)
                return jnp.sum(h.astype(jnp.float32))

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(v, f)
            return l + sum(
                jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(g)
            )

        s = _scan_time(fwdbwd, variables, xyz, feats)
        print(f"sa1_mv131 {dtype_name} {label:10s} fwd+bwd {s * 1e3:8.2f} ms")
    ops_config.pregather_dense = None


def bench_train_step(dtype_name: str, quick: bool):
    sys.argv = [sys.argv[0]]  # bench.time_train reads nothing, but be safe
    import jax.numpy as jnp

    import bench
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    dt = jnp.bfloat16 if dtype_name == "bf16" else None
    for flag, label in ((False, "unfused"), (None, "pregather-auto")):
        ops_config.pregather_dense = flag
        for is_msg, mname in ((False, "ssg"), (True, "msg")):
            if quick and is_msg:
                continue
            m = models.get_model(
                num_classes=20, is_msg=is_msg, input_channels=131, dtype=dt
            )
            draws = bench.time_train(m, fused=8, repeats=3)
            med = draws[len(draws) // 2]
            print(
                f"train {mname}_mv131 {dtype_name} {label:14s} "
                f"step {med * 1e3:8.2f} ms (min {draws[0] * 1e3:.2f} "
                f"max {draws[-1] * 1e3:.2f}) "
                f"{32 * 8192 / med / 1e6:.2f} Mpts/s"
            )
    ops_config.pregather_dense = None


if __name__ == "__main__":
    enable_compilation_cache()
    quick = "--quick" in sys.argv
    for dtype_name in ("f32", "bf16"):
        bench_sa1_block(dtype_name, quick)
    for dtype_name in ("f32", "bf16"):
        bench_train_step(dtype_name, quick)
