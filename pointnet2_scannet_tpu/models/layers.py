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
    ) -> jnp.ndarray:
        """bn_momentum overrides the running-stat momentum (flax convention:
        new = m*old + (1-m)*batch) for THIS call; pass a traced scalar from
        the train step to schedule it per epoch without recompiling — the
        TPU-native equivalent of the reference BNMomentumScheduler mutating
        module attributes between epochs (pytorch_utils.py:271-297)."""
        n = len(self.widths)
        for i, w in enumerate(self.widths):
            x = nn.Dense(
                w,
                use_bias=not self.bn,
                kernel_init=nn.initializers.he_normal(),
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9 if bn_momentum is None else bn_momentum,
                    epsilon=1e-5,
                    dtype=self.dtype,
                    axis_name=self.bn_axis_name,
                    name=f"bn_{i}",
                )(x)
            if self.last_act or i < n - 1:
                x = nn.relu(x)
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
