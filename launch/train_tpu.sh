#!/usr/bin/env bash
# Launch a training run on a TPU VM (counterpart of the reference's
# slurm/train.job single-GPU submission). Run directly on the TPU VM, or
# under your scheduler of choice; all state lands in --output_root so any
# preempted job resumes with --resume.
set -euo pipefail

DATA_DIR=${DATA_DIR:-data/preprocessed_scenes}
OUTPUT_ROOT=${OUTPUT_ROOT:-outputs}
TAG=${TAG:-ssg}

python scripts/train.py \
  --tag "$TAG" \
  --data_dir "$DATA_DIR" \
  --output_root "$OUTPUT_ROOT" \
  --batch_size 32 --epoch 500 --lr 1e-3 --ds 100 --df 0.7 \
  --use_color --use_normal \
  "$@"
