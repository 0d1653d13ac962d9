"""ENet encoder for 2D multiview features, in Flax (NHWC).

Behavioral counterpart of the reference's hand-transcribed Torch7 ENet
(lib/enet.py:130-695, encoder only — the decoder is commented out there) and
its 3-way split for the 3D pipeline (create_enet_for_3d, lib/enet.py:697-715):
a frozen prefix (initial block + bottleneck sections 1-2), a trainable last-8
bottleneck section (section 3), and a 1x1 classifier. For a 256x328 RGB
input the encoder emits a 128-channel feature map at 32x41 — the per-frame
features that get projected onto points (SURVEY.md §3.4).

Architecture (matching the reference listing exactly):
  initial: concat[Conv3x3/s2 3->13, MaxPool2x2] -> 16ch, BN(eps 1e-3), PReLU
  b1.0 (down 16->64, pad skip +48) + 4x b1.x (proj 16)
  b2.0 (down 64->128, pad skip +64)
  section2 (128ch, proj 32): [reg, dil2, asym5, dil4, reg, dil8, asym5, dil16]
  section3: same 8-block pattern, dilations repeated
  classifier: 1x1 conv 128 -> num_classes (bias-free)

Weights are converted from the reference's Torch checkpoint
(data/scannetv2_enet.pth, 41 NYU classes) by `load_torch_enet_weights`,
walking both parameter sequences in lockstep.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C) semantics), channels-last."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha", lambda _: jnp.full((self.channels,), 0.25, jnp.float32)
        )
        return jnp.where(x >= 0, x, alpha * x)


def _bn(train: bool, name: str) -> nn.BatchNorm:
    # torch BatchNorm2d(C, eps=0.001, momentum=0.1) -> flax momentum 0.9
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3, name=name
    )


class InitialBlock(nn.Module):
    """concat[Conv2d(3->13, 3x3, s2), MaxPool2x2] -> BN -> PReLU (16ch)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = nn.Conv(13, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name="conv")(x)
        pool = nn.max_pool(x, (2, 2), strides=(2, 2))
        h = jnp.concatenate([conv, pool], axis=-1)
        h = _bn(train, "bn")(h)
        return PReLU(16, name="prelu")(h)


@dataclasses.dataclass(frozen=True)
class BottleneckSpec:
    kind: str  # "regular" | "dilated" | "asym" | "down"
    in_ch: int
    proj_ch: int
    out_ch: int
    dilation: int = 1
    dropout: float = 0.1


class Bottleneck(nn.Module):
    """ENet bottleneck: 1x1(or 2x2/s2) proj -> core conv -> 1x1 expand, with
    BN+PReLU between, spatial dropout, residual add, PReLU."""

    spec: BottleneckSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        s = self.spec
        down = s.kind == "down"

        if down:
            h = nn.Conv(
                s.proj_ch, (2, 2), strides=(2, 2), use_bias=False, name="proj"
            )(x)
        else:
            h = nn.Conv(s.proj_ch, (1, 1), use_bias=False, name="proj")(x)
        h = _bn(train, "proj_bn")(h)
        h = PReLU(s.proj_ch, name="proj_prelu")(h)

        if s.kind == "asym":
            h = nn.Conv(
                s.proj_ch, (1, 5), padding=((0, 0), (2, 2)), use_bias=False,
                name="core_a",
            )(h)
            h = nn.Conv(
                s.proj_ch, (5, 1), padding=((2, 2), (0, 0)), name="core_b"
            )(h)
        else:
            d = s.dilation
            h = nn.Conv(
                s.proj_ch,
                (3, 3),
                padding=((d, d), (d, d)),
                kernel_dilation=(d, d),
                name="core",
            )(h)
        h = _bn(train, "core_bn")(h)
        h = PReLU(s.proj_ch, name="core_prelu")(h)

        h = nn.Conv(s.out_ch, (1, 1), use_bias=False, name="expand")(h)
        h = _bn(train, "expand_bn")(h)
        # spatial dropout in the torch7 NON-inverted convention the reference
        # keeps (lib/enet.py:89-97: input is pre-scaled by (1-p), canceling
        # torch's 1/(1-p)): train = channel mask with NO rescale,
        # eval = multiply by (1-p). The pretrained weights expect this.
        if train:
            h = nn.Dropout(
                rate=s.dropout, broadcast_dims=(1, 2), deterministic=False,
                name="dropout",
            )(h) * (1.0 - s.dropout)
        else:
            h = h * (1.0 - s.dropout)

        if down:
            skip = nn.max_pool(x, (2, 2), strides=(2, 2))
            pad = s.out_ch - s.in_ch
            skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, pad)))
        else:
            skip = x
        return PReLU(s.out_ch, name="out_prelu")(h + skip)


def _section_specs(in_ch: int, proj: int, dropout: float) -> list[BottleneckSpec]:
    """The repeated 8-block ENet section pattern (lib/enet.py:344-583)."""
    k = lambda kind, dil=1: BottleneckSpec(kind, in_ch, proj, in_ch, dil, dropout)
    return [
        k("regular"),
        k("dilated", 2),
        k("asym"),
        k("dilated", 4),
        k("regular"),
        k("dilated", 8),
        k("asym"),
        k("dilated", 16),
    ]


ENET_SPECS: list[BottleneckSpec] = (
    [BottleneckSpec("down", 16, 16, 64, dropout=0.01)]
    + [BottleneckSpec("regular", 64, 16, 64, dropout=0.01)] * 4
    + [BottleneckSpec("down", 64, 32, 128, dropout=0.1)]
    + _section_specs(128, 32, 0.1)
    + _section_specs(128, 32, 0.1)
)
NUM_FIXED_BOTTLENECKS = 14  # initial + b1.* + b2.0 + section2 are frozen
NUM_TRAINABLE_BOTTLENECKS = 8  # section3 (create_enet_for_3d, enet.py:701-702)


class ENetEncoder(nn.Module):
    """Full encoder: (B, H, W, 3) -> (B, H/8, W/8, 128)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = InitialBlock(name="initial")(x, train)
        for i, spec in enumerate(ENET_SPECS):
            h = Bottleneck(spec, name=f"bottleneck_{i}")(h, train)
        return h


class ENetClassifier(nn.Module):
    """1x1 classifier head (lib/enet.py:588-590)."""

    num_classes: int = 41

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.num_classes, (1, 1), use_bias=False, name="conv")(x)


class ENetSemSeg(nn.Module):
    """Encoder + classifier, for parity tests and 2D eval."""

    num_classes: int = 41

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = ENetEncoder(name="encoder")(x, train)
        return ENetClassifier(self.num_classes, name="classifier")(h)


# --------------------------- torch weight import ---------------------------


def _torch_modules_in_order():
    """Yield ("conv"|"bn"|"prelu", my_param_path) pairs in the order the
    reference torch Sequential flattens its state_dict."""
    order: list[tuple[str, tuple[str, ...]]] = []
    # initial block: conv (in the ConcatTable), then BN, then PReLU
    order.append(("conv", ("encoder", "initial", "conv")))
    order.append(("bn", ("encoder", "initial", "bn")))
    order.append(("prelu", ("encoder", "initial", "prelu")))
    for i, spec in enumerate(ENET_SPECS):
        base = ("encoder", f"bottleneck_{i}")
        order.append(("conv", base + ("proj",)))
        order.append(("bn", base + ("proj_bn",)))
        order.append(("prelu", base + ("proj_prelu",)))
        if spec.kind == "asym":
            order.append(("conv", base + ("core_a",)))
            order.append(("conv", base + ("core_b",)))
        else:
            order.append(("conv", base + ("core",)))
        order.append(("bn", base + ("core_bn",)))
        order.append(("prelu", base + ("core_prelu",)))
        order.append(("conv", base + ("expand",)))
        order.append(("bn", base + ("expand_bn",)))
        order.append(("prelu", base + ("out_prelu",)))
    order.append(("conv", ("classifier", "conv")))
    return order


def load_torch_enet_weights(path: str):
    """Convert the reference Torch checkpoint into flax variables for
    ENetSemSeg: returns {"params": ..., "batch_stats": ...}.

    Torch state_dict insertion order follows module definition order, which
    matches `_torch_modules_in_order`; conv kernels are transposed
    OIHW -> HWIO.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    keys = [k for k in sd.keys() if not k.endswith("num_batches_tracked")]
    params: dict = {}
    stats: dict = {}

    def put(tree, path, name, value):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = value

    ki = 0

    def take(suffix):
        nonlocal ki
        assert keys[ki].endswith(suffix), (keys[ki], suffix)
        v = sd[keys[ki]].numpy()
        ki += 1
        return v

    for kind, path in _torch_modules_in_order():
        if kind == "conv":
            w = take("weight")  # OIHW
            put(params, path, "kernel", np.transpose(w, (2, 3, 1, 0)))
            if ki < len(keys) and keys[ki].endswith("bias") and ".running_" not in keys[ki]:
                # PReLU weights are also called 'weight'; bias only follows
                # immediately for biased convs
                if sd[keys[ki]].ndim == 1 and keys[ki].rsplit(".", 1)[0] == (
                    keys[ki - 1].rsplit(".", 1)[0]
                ):
                    put(params, path, "bias", take("bias"))
        elif kind == "bn":
            put(params, path, "scale", take("weight"))
            put(params, path, "bias", take("bias"))
            put(stats, path, "mean", take("running_mean"))
            put(stats, path, "var", take("running_var"))
        elif kind == "prelu":
            put(params, path, "alpha", take("weight"))
    assert ki == len(keys), f"consumed {ki} of {len(keys)} torch tensors"
    return {"params": params, "batch_stats": stats}


# ScanNet frame normalization used when extracting features
# (scripts/compute_multiview_features.py:73)
ENET_RGB_MEAN = (0.496342, 0.466664, 0.440796)
ENET_RGB_STD = (0.277856, 0.28623, 0.291129)


def normalize_frame(rgb01: np.ndarray) -> np.ndarray:
    """(H, W, 3) floats in [0,1] -> normalized for ENet."""
    return (rgb01 - np.asarray(ENET_RGB_MEAN)) / np.asarray(ENET_RGB_STD)


def split_enet_for_3d(variables: dict) -> tuple[dict, dict, dict]:
    """Partition ENet variables into (fixed, trainable, classifier) trees —
    the counterpart of create_enet_for_3d (lib/enet.py:697-715), which
    freezes everything up to the last 8 bottlenecks (section 3) and keeps
    those plus the 1x1 classifier trainable.

    Use with optax.multi_transform / jax.lax.stop_gradient to freeze the
    fixed tree when fine-tuning the 2D encoder jointly with the 3D model.
    """
    trainable_names = {
        f"bottleneck_{i}"
        for i in range(NUM_FIXED_BOTTLENECKS, NUM_FIXED_BOTTLENECKS + NUM_TRAINABLE_BOTTLENECKS)
    }

    def split_tree(tree):
        enc = tree.get("encoder", {})
        fixed = {k: v for k, v in enc.items() if k not in trainable_names}
        trainable = {k: v for k, v in enc.items() if k in trainable_names}
        classifier = tree.get("classifier", {})
        return fixed, trainable, classifier

    fixed_p, train_p, cls_p = split_tree(variables.get("params", {}))
    fixed_s, train_s, cls_s = split_tree(variables.get("batch_stats", {}))
    return (
        {"params": fixed_p, "batch_stats": fixed_s},
        {"params": train_p, "batch_stats": train_s},
        {"params": cls_p, "batch_stats": cls_s},
    )
