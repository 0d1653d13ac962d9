"""Shared NN building blocks.

TPU-native counterpart of the reference's pytorch_utils.py: the reference
"SharedMLP" is a stack of 1x1 Conv2d+BN+ReLU over channels-first tensors
(pytorch_utils.py:11-37); with channels-last layout a 1x1 conv IS a Dense on
the trailing axis, which XLA maps straight onto the MXU as a single matmul
over all leading (batch x point x sample) positions.

BatchNorm semantics matched to torch.nn.BatchNorm2d: normalize over every
axis except channels, eps 1e-5, running stats with torch momentum 0.1
(flax momentum = 1 - 0.1 = 0.9), scale init 1 / bias init 0
(pytorch_utils.py:43-46). Conv weights use He/kaiming-normal init
(pytorch_utils.py:135,169) and drop their bias when BN follows
(pytorch_utils.py:87).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax


class MaskedBatchNorm(nn.Module):
    """Train-mode BatchNorm whose batch statistics weight each leading-axis
    row by a 0/1 mask — zero-padded batch rows are excluded EXACTLY, so the
    stats equal what an unpadded ragged batch of the real rows would produce
    (the reference's torch.split micro-batches are ragged and have no padding
    bias, lib/solver.py:155-169).

    Variable layout matches nn.BatchNorm (params scale/bias, batch_stats
    mean/var), so a model initialized through the plain-BatchNorm path can be
    applied through this one: PointwiseMLP routes here only when a row_mask
    is passed with train=True.

    axis_name: inside shard_map the weighted sums and the mask total are
    psum'd, so stats are global-batch-correct even when shards hold UNEQUAL
    numbers of real rows (flax's pmean-of-means would weight shards equally).
    """

    momentum: jnp.ndarray | float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, row_mask: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        red_axes = tuple(range(x.ndim - 1))
        # stats in float32 like flax's half-precision promotion
        xs = x.astype(jnp.float32)
        w = row_mask.astype(jnp.float32).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 1)
        )
        spatial = float(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1.0
        wsum = jnp.sum(row_mask.astype(jnp.float32)) * spatial
        s1 = jnp.sum(xs * w, axis=red_axes)
        if self.axis_name is not None:
            wsum = lax.psum(wsum, self.axis_name)
            s1 = lax.psum(s1, self.axis_name)
        wsum = jnp.maximum(wsum, 1e-6)
        mean = s1 / wsum
        # TWO-PASS variance (sum of squared deviations), not E[x^2]-E[x]^2:
        # a tail micro-batch can resample a handful of unique points into a
        # near-CONSTANT channel, where the single-pass form cancels
        # catastrophically (error ~ mean^2 * 2^-23 can exceed eps and go
        # negative -> rsqrt = NaN). torch BN is two-pass as well.
        s2 = jnp.sum(jnp.square(xs - mean) * w, axis=red_axes)
        if self.axis_name is not None:
            s2 = lax.psum(s2, self.axis_name)
        var = jnp.maximum(s2 / wsum, 0.0)

        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var

        y = (xs - mean) * lax.rsqrt(var + self.epsilon) * scale + bias
        out_dtype = self.dtype if self.dtype is not None else x.dtype
        return y.astype(out_dtype)


def _mlp_dense(mlp, i: int):
    """Layer-i Dense of a PointwiseMLP-shaped module (shared so the
    pregather variant below creates an IDENTICAL param tree)."""
    return nn.Dense(
        mlp.widths[i],
        use_bias=not mlp.bn,
        kernel_init=nn.initializers.he_normal(),
        dtype=mlp.dtype,
        name=f"dense_{i}",
    )


def _mlp_bn_act(mlp, x, i: int, train, bn_momentum, row_mask):
    """Layer-i BN(+ReLU) tail of a PointwiseMLP-shaped module (same
    sharing rationale as _mlp_dense)."""
    if mlp.bn:
        if row_mask is not None and train:
            x = MaskedBatchNorm(
                momentum=0.9 if bn_momentum is None else bn_momentum,
                epsilon=1e-5,
                dtype=mlp.dtype,
                axis_name=mlp.bn_axis_name,
                name=f"bn_{i}",
            )(x, row_mask)
        else:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9 if bn_momentum is None else bn_momentum,
                epsilon=1e-5,
                dtype=mlp.dtype,
                axis_name=mlp.bn_axis_name,
                name=f"bn_{i}",
            )(x)
    if mlp.last_act or i < len(mlp.widths) - 1:
        x = nn.relu(x)
    return x


class PointwiseMLP(nn.Module):
    """Stack of Dense(+BN)(+ReLU) layers applied pointwise on the last axis.

    Works on any rank: (B, N, C), (B, M, K, C), ...
    """

    widths: Sequence[int]
    bn: bool = True
    # activation applied after every layer, like the reference SharedMLP
    # (pytorch_utils.py:24-36); set last_act=False for a head's final layer.
    last_act: bool = True
    dtype: jnp.dtype | None = None  # compute dtype (None = inherit input)
    # mapped-axis name for cross-device BN statistics: set to the dp axis
    # when the model runs inside shard_map so train-time BN normalizes over
    # the GLOBAL batch (bit-parity with the GSPMD/pjit step); None under
    # jit/GSPMD, where XLA already sees the full batch.
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        bn_momentum: jnp.ndarray | float | None = None,
        row_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """bn_momentum overrides the running-stat momentum (flax convention:
        new = m*old + (1-m)*batch) for THIS call; pass a traced scalar from
        the train step to schedule it per epoch without recompiling — the
        TPU-native equivalent of the reference BNMomentumScheduler mutating
        module attributes between epochs (pytorch_utils.py:271-297).

        row_mask: optional (B,) 0/1 real-row marks — with train=True the BN
        batch statistics exclude padded rows exactly (MaskedBatchNorm; the
        whole-scene grad-accum path pads its trailing micro-batch)."""
        for i in range(len(self.widths)):
            x = _mlp_dense(self, i)(x)
            x = _mlp_bn_act(self, x, i, train, bn_momentum, row_mask)
        return x


class _Dense0Params(nn.Module):
    """Bare kernel(+bias) of a layer-0 Dense, with nn.Dense's exact param
    names/shapes/inits, so PointwiseMLPPregather's "dense_0" is
    checkpoint-interchangeable with PointwiseMLP's while the math applies
    the kernel in split (xyz rows / feature rows) form."""

    features: int
    in_features: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        return kernel, bias


class PointwiseMLPPregather(nn.Module):
    """PointwiseMLP whose FIRST Dense consumes the features at SOURCE
    resolution, BEFORE the neighborhood gather.

    A pointwise Dense commutes with a row gather — gather(f)[j] @ W ==
    gather(f @ W)[j] — so layer 0 splits its kernel by input rows:

        Dense0([gxyz - c | gather(feats)])
          == gather(feats @ W_f) + (gxyz - c) @ W_x   (+ bias)

    The feature half gathers widths[0] channels instead of C; the xyz half
    stays a 3-channel CENTERED gather (centering before any bf16 cast keeps
    full relative precision, same rationale as the packed-bf16 grouping in
    ops/neighborhood.py). When C >> widths[0] — the 131-channel multiview
    recipes (reference README.md:11-12), C = 131 vs widths[0] = 32 — the
    gather moves ~4x fewer bytes at SA1, and the chunk-select kernel's cost
    scales with C (vmem_gather_kernel.py).

    Param/variable tree is IDENTICAL to PointwiseMLP for the same widths
    (shared _mlp_dense/_mlp_bn_act builders + _Dense0Params), so checkpoints
    move freely between the two paths and models/convert.py is unaffected.
    Numerics differ from the unfused path only in f32/bf16 summation order.
    """

    widths: Sequence[int]
    bn: bool = True
    last_act: bool = True
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray | None,
        features: jnp.ndarray,
        idx: jnp.ndarray,
        new_xyz: jnp.ndarray | None,
        train: bool = False,
        bn_momentum: jnp.ndarray | float | None = None,
        row_mask: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """xyz (B, N, 3) + new_xyz (B, M, 3) for the use_xyz form (both None
        otherwise); features (B, N, C) source rows; idx (B, M, K)."""
        from pointnet2_scannet_tpu.ops.neighborhood import (
            group_points,
            group_with_idx,
        )

        use_xyz = xyz is not None
        c_in = features.shape[-1] + (3 if use_xyz else 0)
        kernel, bias = _Dense0Params(
            self.widths[0], c_in, not self.bn, name="dense_0"
        )()
        dt = self.dtype if self.dtype is not None else features.dtype
        if use_xyz:
            k_x, k_f = kernel[:3], kernel[3:]
        else:
            k_x, k_f = None, kernel
        zf = features.astype(dt) @ k_f.astype(dt)  # (B, N, w0)
        x = group_points(zf, idx)  # (B, M, K, w0)
        if use_xyz:
            # centered 3-channel gather in the source dtype, cast AFTER
            # centering (bf16-safe), then the xyz rows of the kernel
            gxyz = group_with_idx(idx, xyz, new_xyz, None, use_xyz=True)
            x = x + gxyz.astype(dt) @ k_x.astype(dt)
        if bias is not None:
            x = x + bias.astype(dt)
        x = _mlp_bn_act(self, x, 0, train, bn_momentum, row_mask)
        for i in range(1, len(self.widths)):
            x = _mlp_dense(self, i)(x)
            x = _mlp_bn_act(self, x, i, train, bn_momentum, row_mask)
        return x


class RandomDropout(nn.Module):
    """Dropout with a per-call random rate theta ~ U(0, p) and NO 1/(1-p)
    rescaling (reference RandomDropout + feature_dropout_no_scaling,
    pointnet2_utils.py:40-48)."""

    p: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.p == 0.0:
            return x
        import jax

        rng = self.make_rng("dropout")
        theta_rng, mask_rng = jax.random.split(rng)
        theta = jax.random.uniform(theta_rng, (), minval=0.0, maxval=self.p)
        keep = jax.random.bernoulli(mask_rng, 1.0 - theta, x.shape)
        return jnp.where(keep, x, 0.0)


class FC(nn.Module):
    """Fully-connected block on (B, C) vectors: Linear(+BN1d)(+activation),
    with the reference's pre-activation ordering option (pytorch_utils.py
    FC, :225-268). Bias is dropped when BN follows, like the reference (the
    Linear keeps bias only without BN). Unused by the semseg pipeline;
    provided for classifier-style heads."""

    out_size: int
    bn: bool = False
    preact: bool = False
    activation: bool = True  # ReLU, like the reference default
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        bn_momentum: jnp.ndarray | float | None = None,
    ) -> jnp.ndarray:
        def batchnorm(name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9 if bn_momentum is None else bn_momentum,
                epsilon=1e-5,
                dtype=self.dtype,
                name=name,
            )

        if self.preact:
            if self.bn:
                x = batchnorm("bn_pre")(x)
            if self.activation:
                x = nn.relu(x)
        x = nn.Dense(
            self.out_size,
            use_bias=not self.bn,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            name="fc",
        )(x)
        if not self.preact:
            if self.bn:
                x = batchnorm("bn")(x)
            if self.activation:
                x = nn.relu(x)
        return x


class BNMomentumScheduler:
    """Epoch-indexed BatchNorm momentum schedule (the reference's
    BNMomentumScheduler, pytorch_utils.py:271-297, which walks the torch
    module tree mutating .momentum between epochs).

    TPU-native design: flax modules are immutable and the train step is one
    compiled program, so instead of mutating modules this scheduler just maps
    epoch -> momentum, and the value is fed into the jitted step as a traced
    scalar (every PointwiseMLP/FC call accepts bn_momentum) — no recompile
    per epoch. `bn_lambda` returns a TORCH-convention momentum m_t (weight of
    the new batch stat); the returned value is the flax convention 1 - m_t.
    """

    def __init__(self, bn_lambda, last_epoch: int = -1):
        self.lmbd = bn_lambda
        self.last_epoch = last_epoch

    def step(self, epoch: int | None = None) -> float:
        if epoch is None:
            epoch = self.last_epoch + 1
        self.last_epoch = epoch
        return 1.0 - float(self.lmbd(epoch))
