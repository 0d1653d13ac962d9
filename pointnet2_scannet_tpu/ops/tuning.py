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
    # three_interpolate as a dense MXU matmul (scatter-free backward) instead
    # of gather + XLA scatter-add transpose; None = auto (on for TPU backends,
    # measured ~7% faster on the full SSG train step)
    interpolate_dense: bool | None = None
    # group_points with a sort+segment-sum backward instead of scatter-add
    group_segsum: bool = False
    # Pallas kernels: True/False forces, None = auto (TPU backends with
    # lane-aligned shapes only)
    fps_pallas: bool | None = None
    ball_query_pallas: bool | None = None
    three_nn_pallas: bool | None = None
    # grouping gathers as one-hot MXU matmuls. Measured SLOWER than XLA's
    # gather at the SSG shapes (lane padding C->128 plus the exactness-
    # required Precision.HIGHEST make it ~2.5x the step time) — default off,
    # kept for wide-channel use cases.
    mxu_gather: bool | None = False


ops_config = OpsConfig()
