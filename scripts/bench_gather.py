"""Microbench the grouping-gather lowerings at the SA1 production shape.

Times are measured with the op repeated inside one jitted lax.scan (device-
side loop) and only a scalar fetched, so neither the ~10 ms tunnel dispatch
latency nor the ~100 MB/s tunnel fetch bandwidth pollutes the numbers.

Shape: SA1 of the SSG model at B=32 — gather J = M*K = 32768 rows of C
channels from N = 8192 points, per batch element.
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPS = 20


def device_time(name, fn, *args):
    """fn is jitted and loops REPS times on device; returns ms per rep."""
    out = fn(*args)
    float(np.asarray(out))  # compile + settle
    t0 = time.perf_counter()
    out = fn(*args)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / REPS * 1000
    print(f"{name:<52} {dt:9.3f} ms/call")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.ops.pallas import gather_kernel
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, N, M, K = 32, 8192, 1024, 32
    rng = np.random.default_rng(0)
    for C in (9, 32, 64):
        src = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, N, (B, M * K)).astype(np.int32))

        def loop(op):
            # each iteration's input depends on the previous output (a tiny
            # scalar bleed) so XLA cannot hoist the loop-invariant op out of
            # the scan and run it once
            def body(acc, _):
                out = op(src + acc * 1e-20, idx)
                return jnp.sum(out[:, ::997, 0]), None

            def run(src, idx):
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=REPS
                )
                return acc

            return jax.jit(run)

        print(f"== C={C} fwd ==")
        device_time(
            f"xla take_along_axis C={C}",
            loop(lambda s, i: jnp.take_along_axis(s, i[..., None], axis=1)),
            src,
            idx,
        )
        device_time(
            f"mxu_gather (f32 HIGHEST) C={C}",
            loop(gather_kernel.mxu_gather),
            src,
            idx,
        )
        device_time(
            f"mxu_gather_split (3x bf16, exact) C={C}",
            loop(gather_kernel.mxu_gather_split),
            src,
            idx,
        )

        print(f"== C={C} bwd (vjp of sum) ==")

        def grad_loop(op):
            def g(s, i):
                return jax.grad(lambda ss: jnp.sum(op(ss, i) * 0.5))(s)

            def body(acc, _):
                out = g(src + acc * 1e-20, idx)
                return jnp.sum(out[:, ::997, 0]), None

            def run(src, idx):
                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0), None, length=REPS
                )
                return acc

            return jax.jit(run)

        device_time(
            f"xla scatter-add bwd C={C}",
            grad_loop(lambda s, i: jnp.take_along_axis(s, i[..., None], axis=1)),
            src,
            idx,
        )
        device_time(
            f"mxu_gather bwd C={C}",
            grad_loop(gather_kernel.mxu_gather),
            src,
            idx,
        )
        device_time(
            f"mxu_gather_split bwd C={C}",
            grad_loop(gather_kernel.mxu_gather_split),
            src,
            idx,
        )


if __name__ == "__main__":
    main()
