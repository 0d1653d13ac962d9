#!/usr/bin/env bash
# Dump palette PLY predictions for a finished run (counterpart of
# slurm/visualize.job).
# Usage: launch/visualize_tpu.sh outputs/<stamp>_<TAG> [extra flags]
set -euo pipefail

RUN_DIR=${1:?usage: visualize_tpu.sh <run_dir> [flags]}
shift || true
python scripts/visualize.py --folder "$RUN_DIR" "$@"
