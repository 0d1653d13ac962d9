#!/usr/bin/env bash
# Resume an interrupted run from its last checkpoint (full train state).
# Usage: launch/resume_tpu.sh outputs/<stamp>_<TAG>
set -euo pipefail

RUN_DIR=${1:?usage: resume_tpu.sh <run_dir>}
shift || true
python scripts/train.py --resume "$RUN_DIR" "$@"
