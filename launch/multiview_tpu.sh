#!/usr/bin/env bash
# Run the full multiview feature pipeline — ENet features, projection
# maps, and HDF5 fusion in one pass (counterpart of the reference's THREE
# jobs: slurm/compute_multiview_features.job,
# compute_multiview_projection.job, project_multiview_features.job).
# Usage: launch/multiview_tpu.sh <frames_root> <scene_list> [extra flags]
set -euo pipefail

FRAMES_ROOT=${1:?usage: multiview_tpu.sh <frames_root> <scene_list> [flags]}
SCENE_LIST=${2:?usage: multiview_tpu.sh <frames_root> <scene_list> [flags]}
shift 2
DATA_DIR=${DATA_DIR:-data/preprocessed_scenes}
ENET_PATH=${ENET_PATH:-data/scannetv2_enet.pth}
OUTPUT=${OUTPUT:-data/enet_feats.hdf5}

python scripts/multiview.py \
  --frames_root "$FRAMES_ROOT" \
  --scene_list "$SCENE_LIST" \
  --data_dir "$DATA_DIR" \
  --enet_path "$ENET_PATH" \
  --output "$OUTPUT" \
  "$@"
