"""PointNet++ semantic-segmentation models (SSG and MSG).

Hyperparameters replicate the reference exactly:
  - SSG: pointnet2_semseg.py:109-116 — npoint [1024,256,64,16],
    radius [0.1,0.2,0.4,0.8], nsample 32, MLPS [[32,32,64],[64,64,128],
    [128,128,256],[256,256,512]], FP [[128,128],[256,128],[256,256],[256,256]].
  - MSG: pointnet2_semseg.py:29-36 — radii [[.05,.1],[.1,.2],[.2,.4],[.4,.8]],
    nsamples [16,32] per level, dual-branch MLPS, FP [[128,128],[256,256],
    [512,512],[512,512]].
  - Head: Conv1d(->128, BN, ReLU) + Dropout(0.5) + Conv1d(->num_classes, BN,
    no activation) (pointnet2_semseg.py:73-80; yes, BatchNorm on the logits —
    the reference does this and parity requires it).
  - use_xyz adds +3 to every SA scale's first MLP width
    (pointnet2_modules.py:121-123), and the sampled xyz gradient flows back
    through the centroid gather, as in the reference gather_operation.

Input: (B, N, 3 + input_channels) channels-last; output: (B, N, num_classes).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from pointnet2_scannet_tpu.models.layers import PointwiseMLP
from pointnet2_scannet_tpu.models.modules import FeaturePropagation, SetAbstraction


@dataclasses.dataclass(frozen=True)
class PointNet2Spec:
    """Static architecture description (hashable: usable as a jit static arg)."""

    num_classes: int
    input_channels: int  # feature channels beyond xyz
    npoints: tuple[int, ...]
    radii: tuple[tuple[float, ...], ...]  # per level, per scale
    nsamples: tuple[tuple[int, ...], ...]
    sa_mlps: tuple[tuple[tuple[int, ...], ...], ...]  # level -> scale -> widths
    fp_mlps: tuple[tuple[int, ...], ...]
    cls_fc: tuple[int, ...] = (128,)
    dropout: float = 0.5
    use_xyz: bool = True
    bn: bool = True

    @property
    def sa_out_channels(self) -> tuple[int, ...]:
        return tuple(sum(m[-1] for m in level) for level in self.sa_mlps)

    @property
    def skip_channels(self) -> tuple[int, ...]:
        return (self.input_channels,) + self.sa_out_channels


def ssg_spec(num_classes: int = 20, input_channels: int = 0) -> PointNet2Spec:
    """Single-scale-grouping config (pointnet2_semseg.py:109-116)."""
    return PointNet2Spec(
        num_classes=num_classes,
        input_channels=input_channels,
        npoints=(1024, 256, 64, 16),
        radii=((0.1,), (0.2,), (0.4,), (0.8,)),
        nsamples=((32,), (32,), (32,), (32,)),
        sa_mlps=(
            ((32, 32, 64),),
            ((64, 64, 128),),
            ((128, 128, 256),),
            ((256, 256, 512),),
        ),
        fp_mlps=((128, 128), (256, 128), (256, 256), (256, 256)),
    )


def msg_spec(num_classes: int = 20, input_channels: int = 0) -> PointNet2Spec:
    """Multi-scale-grouping config (pointnet2_semseg.py:29-36)."""
    return PointNet2Spec(
        num_classes=num_classes,
        input_channels=input_channels,
        npoints=(1024, 256, 64, 16),
        radii=((0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8)),
        nsamples=((16, 32), (16, 32), (16, 32), (16, 32)),
        sa_mlps=(
            ((16, 16, 32), (32, 32, 64)),
            ((64, 64, 128), (64, 96, 128)),
            ((128, 196, 256), (128, 196, 256)),
            ((256, 256, 512), (256, 384, 512)),
        ),
        fp_mlps=((128, 128), (256, 256), (512, 512), (512, 512)),
    )


def get_model(
    num_classes: int,
    is_msg: bool = True,
    input_channels: int = 6,
    use_xyz: bool = True,
    bn: bool = True,
    dtype: jnp.dtype | None = None,
    bn_axis_name: str | None = None,
) -> "PointNet2SemSeg":
    """Factory mirroring the reference get_model (pointnet2_semseg.py:7-23)."""
    spec = (msg_spec if is_msg else ssg_spec)(num_classes, input_channels)
    spec = dataclasses.replace(spec, use_xyz=use_xyz, bn=bn)
    return PointNet2SemSeg(spec=spec, dtype=dtype, bn_axis_name=bn_axis_name)


class PointNet2SemSeg(nn.Module):
    """Encoder-decoder PointNet++ over a fixed-size point chunk."""

    spec: PointNet2Spec
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        pc: jnp.ndarray,
        train: bool = False,
        bn_momentum: jnp.ndarray | float | None = None,
        row_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """bn_momentum (flax convention, optional traced scalar) schedules the
        BatchNorm running-stat momentum per step/epoch without recompiling —
        pair with models.layers.BNMomentumScheduler.

        row_mask: optional (B,) 0/1 real-row marks; with train=True the BN
        batch statistics exclude padded rows exactly (the whole-scene
        grad-accum path pads its trailing micro-batch — the reference's
        ragged torch.split batches have no padding, lib/solver.py:155-169)."""
        spec = self.spec
        xyz = pc[..., :3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        l_xyz: list[jnp.ndarray] = [xyz]
        l_feats: list[jnp.ndarray | None] = [features]
        for lvl in range(len(spec.npoints)):
            new_xyz, new_feats, _ = SetAbstraction(
                npoint=spec.npoints[lvl],
                radii=spec.radii[lvl],
                nsamples=spec.nsamples[lvl],
                mlps=spec.sa_mlps[lvl],
                use_xyz=spec.use_xyz,
                bn=spec.bn,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"sa_{lvl}",
            )(l_xyz[lvl], l_feats[lvl], train, bn_momentum, row_mask)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)

        # decoder: deepest level first (pointnet2_semseg.py:96-99)
        for lvl in reversed(range(len(spec.fp_mlps))):
            l_feats[lvl] = FeaturePropagation(
                mlp=spec.fp_mlps[lvl],
                bn=spec.bn,
                dtype=self.dtype,
                bn_axis_name=self.bn_axis_name,
                name=f"fp_{lvl}",
            )(l_xyz[lvl], l_xyz[lvl + 1], l_feats[lvl], l_feats[lvl + 1], train, bn_momentum, row_mask)

        # classifier head (pointnet2_semseg.py:73-80)
        h = PointwiseMLP(spec.cls_fc, bn=spec.bn, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name="cls_fc")(
            l_feats[0], train, bn_momentum, row_mask
        )
        h = nn.Dropout(rate=spec.dropout, deterministic=not train)(h)
        logits = PointwiseMLP(
            (spec.num_classes,), bn=spec.bn, last_act=False, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="cls_out",
        )(h, train, bn_momentum, row_mask)
        return logits.astype(jnp.float32)
