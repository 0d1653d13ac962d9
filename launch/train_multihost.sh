#!/usr/bin/env bash
# Launch ONE process of a multi-host (pod-scale) training run. Run this on
# every host of the pod slice (e.g. via `gcloud compute tpus tpu-vm ssh
# --worker=all`), giving each host its index; process 0's host binds the
# coordinator port. The dp mesh then spans every host's chips — each host
# loads its own scene shard and feeds its rows of the global batch
# (pointnet2_scannet_tpu/parallel/distributed.py).
#
# Usage:
#   COORDINATOR=host0:8476 NPROCS=4 PID=$(hostname_index) \
#     launch/train_multihost.sh [extra train.py flags]
#
# The same path is exercised end-to-end with real separate processes on the
# CPU backend by tests/test_multihost.py.
set -euo pipefail

COORDINATOR=${COORDINATOR:?set COORDINATOR=host0:port (same on every host)}
NPROCS=${NPROCS:?set NPROCS=<total process count>}
PID=${PID:?set PID=<this host's index in [0, NPROCS)>}
DATA_DIR=${DATA_DIR:-data/preprocessed_scenes}
OUTPUT_ROOT=${OUTPUT_ROOT:-outputs}
TAG=${TAG:-ssg-pod}

python scripts/train.py \
  --tag "$TAG" \
  --data_dir "$DATA_DIR" \
  --output_root "$OUTPUT_ROOT" \
  --dist_coordinator "$COORDINATOR" \
  --dist_nprocs "$NPROCS" \
  --dist_pid "$PID" \
  --batch_size 32 --epoch 500 --lr 1e-3 --ds 100 --df 0.7 \
  --use_color --use_normal \
  "$@"
