"""Offline multiview feature pipeline CLI.

One command covering the reference's three offline stages
(scripts/compute_multiview_features.py, compute_multiview_projection.py,
project_multiview_features.py): per scene, batch the RGB frames through the
ENet encoder on the accelerator, compute point->pixel correspondences for
every frame, fuse per-point 128-d features first-writer-wins (most-covering
frame first), and store them all into one `enet_feats.hdf5` keyed by scene id
— the file `--use_multiview` training reads.

Expected frame layout (ScanNet frames_square export, lib/config.py:17-23):
  <frames_root>/<scene_id>/color/<fid>.jpg   (RGB)
  <frames_root>/<scene_id>/depth/<fid>.png   (16-bit depth, millimeters)
  <frames_root>/<scene_id>/pose/<fid>.txt    (4x4 camera-to-world)
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

COLOR_DIMS = (328, 256)  # (W, H) ENet input
DEPTH_DIMS = (41, 32)  # (W, H) feature/depth resolution


def resize_crop(image: np.ndarray, dims: tuple[int, int], nearest: bool) -> np.ndarray:
    """Resize keeping aspect then center-crop, like the reference loader
    (compute_multiview_features.py:44-65)."""
    from PIL import Image

    w, h = image.shape[1], image.shape[0]
    if (w, h) == dims:
        return image
    resize_w = int(math.floor(dims[1] * float(w) / float(h)))
    img = Image.fromarray(image).resize(
        (resize_w, dims[1]), Image.NEAREST if nearest else Image.BILINEAR
    )
    left = (resize_w - dims[0]) // 2
    img = img.crop((left, 0, left + dims[0], dims[1]))
    return np.array(img)


def load_frame(scene_dir: pathlib.Path, fid: str):
    import imageio.v2 as imageio

    from pointnet2_scannet_tpu.models.enet import normalize_frame

    color = imageio.imread(scene_dir / "color" / f"{fid}.jpg")
    color = resize_crop(color, COLOR_DIMS, nearest=True)
    color = normalize_frame(color.astype(np.float32) / 255.0).astype(np.float32)

    depth = imageio.imread(scene_dir / "depth" / f"{fid}.png")
    depth = resize_crop(depth, DEPTH_DIMS, nearest=True).astype(np.float32) / 1000.0

    pose = np.loadtxt(scene_dir / "pose" / f"{fid}.txt").astype(np.float32)
    return color, depth, pose


def process_scene(
    scene_id, frames_root, points, encoder_apply, variables, batch_size, cam=None
):
    import jax
    import jax.numpy as jnp

    from pointnet2_scannet_tpu.data import multiview as mv

    if cam is None:
        cam = mv.CameraConfig()
    scene_dir = pathlib.Path(frames_root) / scene_id
    fids = sorted(p.stem for p in (scene_dir / "color").glob("*.jpg"))
    if not fids:
        raise FileNotFoundError(f"no frames for {scene_id} under {scene_dir}")

    feats_list, valids, pixes = [], [], []
    pts = jnp.asarray(points, jnp.float32)
    for start in range(0, len(fids), batch_size):
        chunk = fids[start : start + batch_size]
        colors, depths, poses = zip(*(load_frame(scene_dir, f) for f in chunk))
        colors = jnp.asarray(np.stack(colors))  # (B, H, W, 3)
        feats = encoder_apply(variables, colors)  # (B, 32, 41, 128)
        v, p = mv.compute_correspondence_batch(
            pts, jnp.asarray(np.stack(depths)), jnp.asarray(np.stack(poses)), cam
        )
        feats_list.append(np.asarray(feats))
        valids.append(np.asarray(v))
        pixes.append(np.asarray(p))
    return mv.fuse_scene_features(
        np.concatenate(feats_list),
        np.concatenate(valids),
        np.concatenate(pixes),
    )


def main(args) -> None:
    import h5py
    import jax

    from pointnet2_scannet_tpu.models.enet import ENetEncoder, load_torch_enet_weights
    from pointnet2_scannet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    scene_ids = [l.strip() for l in open(args.scene_list) if l.strip()]
    variables_full = load_torch_enet_weights(args.enet_path)
    enc_vars = {
        "params": variables_full["params"]["encoder"],
        "batch_stats": variables_full["batch_stats"]["encoder"],
    }
    encoder = ENetEncoder()
    encoder_apply = jax.jit(lambda v, x: encoder.apply(v, x, train=False))

    with h5py.File(args.output, "a") as f:
        for scene_id in scene_ids:
            if scene_id in f:
                if args.skip_existing:
                    print(f"{scene_id}: exists, skipping")
                    continue
                del f[scene_id]
            points = np.load(
                pathlib.Path(args.data_dir) / f"{scene_id}.npy"
            )[:, :3]
            fused = process_scene(
                scene_id, args.frames_root, points, encoder_apply, enc_vars,
                args.batch_size,
            )
            covered = float((np.abs(fused).sum(1) > 0).mean())
            f.create_dataset(scene_id, data=fused, compression="gzip")
            print(f"{scene_id}: {fused.shape} features, {covered:.1%} points covered")
    print(f"wrote {args.output}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames_root", type=str, required=True)
    p.add_argument("--data_dir", type=str, default="data/preprocessed_scenes")
    p.add_argument("--scene_list", type=str, required=True)
    p.add_argument("--enet_path", type=str, default="data/scannetv2_enet.pth")
    p.add_argument("--output", type=str, default="data/enet_feats.hdf5")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--skip_existing", action="store_true")
    return p.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
