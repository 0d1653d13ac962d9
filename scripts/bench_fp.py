"""FP-stack variant shootout: three_interpolate lowerings fwd+bwd per level.

Same scan-loop methodology as bench_hotops.py (device-side reps, scalar
bleed, full-output consumption, scalar-only fetch). Compares, at each SSG FP
shape and dtype:

  dense-auto : three_interpolate_dense under plain autodiff (round-2 default)
  cached-W   : three_interpolate_cached (custom_vjp reusing the forward's W)
  fast       : three_interpolate_fast (gather fwd + dense rebuild bwd)
  xla-scatter: take_along_axis + XLA scatter-add transpose

plus three_nn (pallas vs XLA top_k) per level with --three_nn.
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from scripts.bench_hotops import FP_LEVELS, bench  # noqa: E402

B = 32


def main():
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu import ops
    from pointnet2_scannet_tpu.ops.interpolate import (
        three_interpolate,
        three_interpolate_cached,
        three_interpolate_dense,
        three_interpolate_fast,
    )
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    for dtype_name, dtype in (("f32", np.float32), ("bf16", jnp.bfloat16)):
        for name, n, m, C in FP_LEVELS:
            unk = jnp.asarray(rng.uniform(0, 1.5, (B, n, 3)).astype(np.float32))
            kno = jnp.asarray(rng.uniform(0, 1.5, (B, m, 3)).astype(np.float32))
            feats = jnp.asarray(
                rng.normal(size=(B, m, C)).astype(np.float32)
            ).astype(dtype)
            d2, nn3 = jax.jit(ops.three_nn)(unk, kno)
            w = jnp.asarray(rng.uniform(0.1, 1, (B, n, 3)).astype(np.float32))
            w = (w / jnp.sum(w, -1, keepdims=True)).astype(dtype)

            variants = {
                "dense-auto": three_interpolate_dense,
                "cached-W": three_interpolate_cached,
                "fast": three_interpolate_fast,
                "xla-scatter": three_interpolate,
            }
            for vname, fn in variants.items():

                def fb(acc, feats, w, fn=fn):
                    def f(s):
                        return jnp.sum(
                            (fn(s, nn3, w).astype(jnp.float32)) ** 2
                        )

                    val, g = jax.value_and_grad(f)(
                        feats + jnp.asarray(acc * 1e-20, feats.dtype)
                    )
                    return jnp.sum(g).astype(jnp.float32) * 1e-20 + acc

                bench(
                    f"{dtype_name} {name} interp {vname} fwd+bwd (n={n} m={m} C={C})",
                    fb,
                    feats,
                    w,
                )


def main_three_nn(skip_xla: bool = False):
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.ops.interpolate import three_nn
    from pointnet2_scannet_tpu.ops.pallas.three_nn_kernel import three_nn_pallas_t
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for name, n, m, C in FP_LEVELS:
        unk = jnp.asarray(rng.uniform(0, 1.5, (B, n, 3)).astype(np.float32))
        kno = jnp.asarray(rng.uniform(0, 1.5, (B, m, 3)).astype(np.float32))
        # the wrapper's lane gate (m % 128) would silently fall back to XLA
        # even with use_pallas=True — only label a row 'pallas' when the
        # kernel actually runs
        variants = [] if skip_xla else [("xla", None)]
        if m % 128 == 0 and n % min(n, 256) == 0:
            # call the query-major kernel DIRECTLY: the three_nn wrapper's
            # transposed-kernel gate fires first at these shapes, so
            # three_nn(use_pallas=True) would silently bench pallas-t here
            variants.insert(0, ("pallas", None))
        else:
            print(f"{name}: pallas skipped (m={m} not lane-aligned)")
        for tn in (128, 256, 512):
            if n % tn == 0 and m % 8 == 0:
                variants.append((f"pallas-t tn={tn}", tn))
        for label, tn in variants:

            def tnn(acc, unk, kno, label=label, tn=tn):
                if label.startswith("pallas-t"):
                    d2, i = three_nn_pallas_t(unk + acc * 1e-20, kno, tile_n=tn)
                elif label == "pallas":
                    d2, i = three_nn_pallas(unk + acc * 1e-20, kno)
                else:
                    d2, i = three_nn(unk + acc * 1e-20, kno, use_pallas=False)
                return (
                    jnp.sum(d2) * 1e-20
                    + jnp.sum(i).astype(jnp.float32) * 1e-20
                    + acc
                )

            bench(f"{name} three_nn {label} (n={n} m={m})", tnn, unk, kno)


if __name__ == "__main__":
    if "--three_nn" in sys.argv:
        main_three_nn(skip_xla="--skip_xla" in sys.argv)
    else:
        main()
