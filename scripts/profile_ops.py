"""Per-op microbenchmarks at production shapes (B=32, N=8192, SSG levels).

Prints ms/call for each point-cloud primitive and the full forward/train
step, so the performance pass targets the real hotspots. Values are measured
with a forced device fetch (the axon tunnel's block_until_ready is
unreliable).
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timeit(name, fn, iters=5):
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # settle + compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:<42} {dt:9.2f} ms")
    return dt


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu import models, ops
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B = 32
    rng = np.random.default_rng(0)
    xyz = {n: jnp.asarray(rng.uniform(0, 1.5, (B, n, 3)).astype(np.float32))
           for n in (8192, 1024, 256, 64)}
    feats = {
        (8192, 9): jnp.asarray(rng.normal(size=(B, 8192, 9)).astype(np.float32)),
        (8192, 64): jnp.asarray(rng.normal(size=(B, 8192, 64)).astype(np.float32)),
        (1024, 64): jnp.asarray(rng.normal(size=(B, 1024, 64)).astype(np.float32)),
        (1024, 128): jnp.asarray(rng.normal(size=(B, 1024, 128)).astype(np.float32)),
        (256, 128): jnp.asarray(rng.normal(size=(B, 256, 128)).astype(np.float32)),
    }

    levels = [(8192, 1024, 0.1, 32), (1024, 256, 0.2, 32), (256, 64, 0.4, 32),
              (64, 16, 0.8, 32)]

    print(f"== FPS (pallas) ==")
    for n, m, _, _ in levels:
        f = jax.jit(lambda x, m=m: ops.furthest_point_sample(x, m, use_pallas=True))
        timeit(f"fps {n}->{m}", lambda f=f, n=n: f(xyz[n]))
    print(f"== FPS (xla) ==")
    for n, m, _, _ in levels[:2]:
        f = jax.jit(lambda x, m=m: ops.furthest_point_sample(x, m, use_pallas=False))
        timeit(f"fps-xla {n}->{m}", lambda f=f, n=n: f(xyz[n]))

    print("== ball_query ==")
    for n, m, r, k in levels:
        f = jax.jit(lambda x, q, r=r, k=k: ops.ball_query(r, k, x, q))
        timeit(f"ball_query N={n} M={m} k={k}",
               lambda f=f, n=n, m=m: f(xyz[n], xyz[n][:, :m]))

    print("== group_points ==")
    idx = jnp.asarray(rng.integers(0, 8192, (B, 1024, 32)).astype(np.int32))
    f = jax.jit(ops.group_points)
    timeit("group 8192x64 -> 1024x32", lambda: f(feats[(8192, 64)], idx))

    print("== three_nn + interpolate ==")
    f = jax.jit(lambda a, b: ops.three_nn(a, b))
    timeit("three_nn 8192 from 1024", lambda: f(xyz[8192], xyz[1024]))
    d2, nn3 = f(xyz[8192], xyz[1024])
    w = jnp.ones((B, 8192, 3)) / 3
    g = jax.jit(ops.three_interpolate)
    timeit("three_interp 1024x128 -> 8192", lambda: g(feats[(1024, 128)], nn3, w))

    print("== full model ==")
    model = models.get_model(20, is_msg=False, input_channels=6)
    pc = jnp.asarray(rng.uniform(0, 1.5, (B, 8192, 9)).astype(np.float32))
    variables = jax.jit(lambda: model.init(jax.random.key(0), pc[:1], train=False))()
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    timeit("SSG forward B=32 N=8192", lambda: fwd(variables, pc), iters=3)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pc, train=True, rngs={"dropout": jax.random.key(0)},
            mutable=["batch_stats"],
        )
        return jnp.mean(logits ** 2)

    grad = jax.jit(lambda p: jax.grad(loss_fn)(p))
    timeit("SSG fwd+bwd B=32 N=8192", lambda: grad(variables["params"]), iters=3)

    # ---- A/B the op-lowering variants on the full train-direction graph ----
    from pointnet2_scannet_tpu.ops.tuning import ops_config

    for dense, segsum in ((True, False), (False, True), (True, True)):
        ops_config.interpolate_dense = dense
        ops_config.group_segsum = segsum
        g2 = jax.jit(lambda p: jax.grad(loss_fn)(p))
        timeit(
            f"SSG fwd+bwd dense_interp={int(dense)} segsum_group={int(segsum)}",
            lambda g2=g2: g2(variables["params"]),
            iters=3,
        )
    # restore the dataclass defaults (interpolate_dense None = auto;
    # pinning it False here left the slower lowering globally selected)
    ops_config.interpolate_dense = None
    ops_config.group_segsum = False
