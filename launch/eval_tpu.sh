#!/usr/bin/env bash
# Whole-scene evaluation of a finished run (counterpart of slurm/eval.job).
# Usage: launch/eval_tpu.sh outputs/<stamp>_<TAG> [extra eval.py flags]
set -euo pipefail

RUN_DIR=${1:?usage: eval_tpu.sh <run_dir> [flags]}
shift || true
python scripts/eval.py --folder "$RUN_DIR" "$@"
