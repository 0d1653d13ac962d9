"""Global op-implementation switches (read at trace time).

Each hot primitive has more than one lowering with identical semantics but
very different TPU cost profiles; these flags pick the variant the models
trace. Flip BEFORE building/jitting a model (changing them afterwards has no
effect on an already-compiled program).

    from pointnet2_scannet_tpu.ops import tuning
    tuning.ops_config.interpolate_dense = True
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class OpsConfig:
    # FP modules use three_interpolate_fast (VMEM-gather forward + dense
    # MXU backward, weight non-differentiable — the reference's contract).
    # Measured SLOWER than the dense path at the big FP level (fwd 7.3 vs
    # 3.8 ms: the chunk-select gather's VMEM traffic scales with C*N/128 and
    # C=128 is past the crossover) — default off, kept for narrow-channel
    # interpolation workloads.
    interpolate_fast: bool | None = False
    # three_interpolate as a dense MXU matmul (scatter-free backward) instead
    # of gather + XLA scatter-add transpose; None = auto (on for TPU backends,
    # measured ~7% faster on the full SSG train step)
    interpolate_dense: bool | None = None
    # dense interpolate with the explicitly W-CACHING custom_vjp
    # (three_interpolate_cached). Measured a TIE with plain autodiff at the
    # FP shapes (XLA already keeps W as the residual, scripts/bench_fp.py) —
    # default off; useful under remat policies that would rebuild W.
    interpolate_cached: bool = False
    # group_points with a sort+segment-sum backward instead of scatter-add
    group_segsum: bool = False
    # Pallas kernels: True/False forces, None = auto (TPU backends with
    # lane-aligned shapes only)
    fps_pallas: bool | None = None
    ball_query_pallas: bool | None = None
    three_nn_pallas: bool | None = None
    # grouping gathers as one-hot MXU matmuls. Measured SLOWER than XLA's
    # gather at the SSG shapes (the one-hot contraction costs B*J*N*256 MXU
    # FLOPs = 6.6 bf16-TFLOP at SA1 even with the exact 3x-bf16-split
    # variant: 38 ms vs XLA's 13.7 ms, scripts/bench_gather.py) — default
    # off, kept for wide-channel / small-N use cases.
    mxu_gather: bool | None = False
    # grouping/gather rows via the VMEM chunk-select lane-gather kernel
    # (ops/pallas/vmem_gather_kernel.py): ~3x XLA's native gather at the SA
    # shapes (4.5 ms vs 13.5 ms at SA1). None = auto on TPU backends.
    vmem_gather: bool | None = None
    # bf16 models: pack [xyz_hi | xyz_lo | feats] into ONE bf16 grouping
    # gather (half the gather/scatter bytes of the f32 concat, which would
    # otherwise promote the whole payload to f32)
    packed_bf16_group: bool = True
    # SA layer-0 Dense applied to the features at SOURCE resolution before
    # the neighborhood gather (PointwiseMLPPregather): the gather then moves
    # widths[0] channels instead of C. None = auto: engage when the input
    # channel count is at least 2x the first layer width (the wide-channel
    # multiview recipes) in f32/bf16 (f64 keeps the reference-exact
    # composition for the parity suites). True/False force.
    pregather_dense: bool | None = None


ops_config = OpsConfig()
