"""Export a trained checkpoint to the reference's torch state_dict format.

A model trained here can then be loaded by the reference stack unchanged
(torch.load + model.load_state_dict, scripts/eval.py:183-188 there) — interop
with ero1311/Pointnet2.ScanNet runs both directions (convert.py imports
reference checkpoints; this exports ours).

    python scripts/export_torch.py --folder outputs/<stamp>_TAG \
        [--checkpoint model_best] [--out model.pth]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def export(args) -> None:
    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.config import RunConfig
    from pointnet2_scannet_tpu.engine.checkpoint import restore_params_only
    from pointnet2_scannet_tpu.models.convert import save_torch_pointnet2

    run_dir = pathlib.Path(args.folder)
    cfg = RunConfig.load(run_dir / "config.json")
    spec = (models.msg_spec if cfg.model.is_msg else models.ssg_spec)(
        cfg.model.num_classes, cfg.data.input_channels
    )
    import dataclasses

    spec = dataclasses.replace(spec, use_xyz=cfg.model.use_xyz, bn=cfg.model.bn)
    variables = restore_params_only(run_dir, args.checkpoint)
    out = pathlib.Path(args.out) if args.out else run_dir / f"{args.checkpoint}.pth"
    save_torch_pointnet2(str(out), variables, spec)
    print(f"wrote {out} (reference-format state_dict, "
          f"{'MSG' if cfg.model.is_msg else 'SSG'}, "
          f"input_channels={cfg.data.input_channels})")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--folder", type=str, required=True, help="run output dir")
    p.add_argument("--checkpoint", type=str, default="model_best")
    p.add_argument("--out", type=str, default=None, help="output .pth path")
    return p.parse_args(argv)


if __name__ == "__main__":
    export(parse_args())
