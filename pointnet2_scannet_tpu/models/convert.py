"""Convert reference-trained PointNet++ checkpoints (torch state_dicts) into
this framework's flax variables.

The reference saves bare `model.state_dict()` files (lib/solver.py:324,
model.pth / model_last.pth) with the module naming scheme of
pointnet2/pytorch_utils.py + pointnet2_semseg.py:

    SA_modules.{k}.mlps.{s}.layer{i}.conv.weight          (out,in,1,1)
    SA_modules.{k}.mlps.{s}.layer{i}.bn.bn.{weight,bias,
        running_mean,running_var}
    FP_modules.{k}.mlp.layer{i}.conv.weight               (out,in,1,1)
    FP_modules.{k}.mlp.layer{i}.bn.bn.*
    cls_layer.0.conv.weight (out,in,1) + cls_layer.0.bn.bn.*
    cls_layer.2.conv.weight + cls_layer.2.bn.bn.*         (after Dropout at .1)

(the nested "bn.bn" comes from _BNBase wrapping nn.BatchNorm2d,
pytorch_utils.py:39-44; "layer{i}" from SharedMLP, :11-37; conv bias is
disabled whenever BN follows, :87).

Mapping to this framework (channels-last Dense stacks):
    sa_{k}/mlp_{s}/dense_{i}/kernel  <- conv.weight^T (1x1 conv == Dense)
    sa_{k}/mlp_{s}/bn_{i}/{scale,bias} (+ batch_stats mean/var)
    fp_{k}/mlp/dense_{i}/...
    cls_fc/dense_0, cls_out/dense_0 (+ bn_0 each)

Use for bringing reference-trained SSG/MSG models to TPU for evaluation or
fine-tuning. (The reference repo ships no PointNet++ checkpoint, so there is
no golden file to test against; the converter is validated structurally —
every tensor must land, shapes must match the flax template.)
"""

from __future__ import annotations

import numpy as np

from pointnet2_scannet_tpu.models.pointnet2 import PointNet2Spec


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv (out, in, *ones) -> flax Dense kernel (in, out)."""
    w = np.asarray(w)
    return w.reshape(w.shape[0], w.shape[1]).T.astype(np.float32)


def convert_torch_pointnet2(state_dict: dict, spec: PointNet2Spec) -> dict:
    """torch state_dict (tensors or ndarrays) -> {"params", "batch_stats"}."""
    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
        if not k.endswith("num_batches_tracked")
    }
    params: dict = {}
    stats: dict = {}

    def put(tree, *path_and_value):
        *path, name, value = path_and_value
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[name] = value

    def take_block(prefix: str, dst_scope: tuple, i: int):
        w = sd.pop(f"{prefix}.layer{i}.conv.weight")
        put(params, *dst_scope, f"dense_{i}", {"kernel": _conv_kernel(w)})
        bias_key = f"{prefix}.layer{i}.conv.bias"
        if bias_key in sd:
            params_node = params
            for p in dst_scope:
                params_node = params_node[p]
            params_node[f"dense_{i}"]["bias"] = sd.pop(bias_key).astype(np.float32)
        bn = f"{prefix}.layer{i}.bn.bn"
        if f"{bn}.weight" in sd:
            put(
                params, *dst_scope, f"bn_{i}",
                {
                    "scale": sd.pop(f"{bn}.weight").astype(np.float32),
                    "bias": sd.pop(f"{bn}.bias").astype(np.float32),
                },
            )
            put(
                stats, *dst_scope, f"bn_{i}",
                {
                    "mean": sd.pop(f"{bn}.running_mean").astype(np.float32),
                    "var": sd.pop(f"{bn}.running_var").astype(np.float32),
                },
            )

    # SA levels x scales
    for k, level in enumerate(spec.sa_mlps):
        for s, widths in enumerate(level):
            for i in range(len(widths)):
                take_block(f"SA_modules.{k}.mlps.{s}", (f"sa_{k}", f"mlp_{s}"), i)
    # FP levels
    for k, widths in enumerate(spec.fp_mlps):
        for i in range(len(widths)):
            take_block(f"FP_modules.{k}.mlp", (f"fp_{k}", "mlp"), i)
    # classifier head: Sequential[Conv1d, Dropout, Conv1d]
    take_block_head = [("cls_layer.0", ("cls_fc",)), ("cls_layer.2", ("cls_out",))]
    for prefix, scope in take_block_head:
        w = sd.pop(f"{prefix}.conv.weight")
        put(params, *scope, "dense_0", {"kernel": _conv_kernel(w)})
        if f"{prefix}.conv.bias" in sd:
            node = params
            for p in scope:
                node = node[p]
            node["dense_0"]["bias"] = sd.pop(f"{prefix}.conv.bias").astype(np.float32)
        bn = f"{prefix}.bn.bn"
        if f"{bn}.weight" in sd:
            put(params, *scope, "bn_0", {
                "scale": sd.pop(f"{bn}.weight").astype(np.float32),
                "bias": sd.pop(f"{bn}.bias").astype(np.float32),
            })
            put(stats, *scope, "bn_0", {
                "mean": sd.pop(f"{bn}.running_mean").astype(np.float32),
                "var": sd.pop(f"{bn}.running_var").astype(np.float32),
            })

    if sd:
        raise ValueError(f"unconsumed reference tensors: {sorted(sd)[:8]} ...")
    return {"params": params, "batch_stats": stats}


def load_torch_pointnet2(path: str, spec: PointNet2Spec) -> dict:
    import torch

    return convert_torch_pointnet2(
        torch.load(path, map_location="cpu", weights_only=False), spec
    )


def _dense_to_conv(kernel: np.ndarray, conv_rank: int) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch conv weight (out, in, *ones)."""
    w = np.asarray(kernel).T  # (out, in)
    return w.reshape(w.shape + (1,) * (conv_rank - 2)).astype(np.float32)


def export_torch_pointnet2(variables: dict, spec: PointNet2Spec) -> dict:
    """The INVERSE of convert_torch_pointnet2: flax variables ->
    reference-format state_dict (numpy arrays, reference key names/shapes).

    Lets a model trained here be loaded straight into the reference stack
    (`model.load_state_dict({k: torch.from_numpy(v) ...})`) for its
    eval/visualize tooling — interop runs BOTH directions. Round-trip and
    logits-parity tested in tests/test_convert.py.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: dict[str, np.ndarray] = {}

    def emit_block(src_scope: tuple, prefix: str, i: int, conv_rank: int):
        pnode = params
        for p in src_scope:
            pnode = pnode[p]
        dense = pnode[f"dense_{i}"]
        out[f"{prefix}.layer{i}.conv.weight" if conv_rank == 4 else f"{prefix}.conv.weight"] = (
            _dense_to_conv(dense["kernel"], conv_rank)
        )
        base = f"{prefix}.layer{i}" if conv_rank == 4 else prefix
        if "bias" in dense:
            out[f"{base}.conv.bias"] = np.asarray(dense["bias"], np.float32)
        if f"bn_{i}" in pnode:
            bn = pnode[f"bn_{i}"]
            snode = stats
            for p in src_scope:
                snode = snode[p]
            sbn = snode[f"bn_{i}"]
            out[f"{base}.bn.bn.weight"] = np.asarray(bn["scale"], np.float32)
            out[f"{base}.bn.bn.bias"] = np.asarray(bn["bias"], np.float32)
            out[f"{base}.bn.bn.running_mean"] = np.asarray(sbn["mean"], np.float32)
            out[f"{base}.bn.bn.running_var"] = np.asarray(sbn["var"], np.float32)
            out[f"{base}.bn.bn.num_batches_tracked"] = np.asarray(0, np.int64)

    for k, level in enumerate(spec.sa_mlps):
        for s, widths in enumerate(level):
            for i in range(len(widths)):
                emit_block((f"sa_{k}", f"mlp_{s}"), f"SA_modules.{k}.mlps.{s}", i, 4)
    for k, widths in enumerate(spec.fp_mlps):
        for i in range(len(widths)):
            emit_block((f"fp_{k}", "mlp"), f"FP_modules.{k}.mlp", i, 4)
    # the reference head is exactly Conv1d -> Dropout -> Conv1d
    # (pointnet2_semseg.py:73-80); a multi-layer cls_fc has no reference
    # naming to export to
    if len(spec.cls_fc) != 1:
        raise ValueError(
            f"reference export supports a single-layer cls_fc, got {spec.cls_fc}"
        )
    for prefix, scope in (("cls_layer.0", ("cls_fc",)), ("cls_layer.2", ("cls_out",))):
        emit_block(scope, prefix, 0, 3)
    return out


def save_torch_pointnet2(path: str, variables: dict, spec: PointNet2Spec) -> None:
    """Write a reference-loadable model.pth (requires torch)."""
    import torch

    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
         export_torch_pointnet2(variables, spec).items()},
        path,
    )
