#!/usr/bin/env bash
# Preprocess raw ScanNet scans into (N, 11) scene arrays (counterpart of
# the reference's slurm/prep.job). Host-side — no accelerator needed.
set -euo pipefail

SCANS_DIR=${SCANS_DIR:-data/scannet/scans}
LABEL_TSV=${LABEL_TSV:-data/scannetv2-labels.combined.tsv}
OUTPUT_DIR=${OUTPUT_DIR:-data/preprocessed_scenes}

python scripts/preprocess.py \
  --scans_dir "$SCANS_DIR" \
  --label_tsv "$LABEL_TSV" \
  --output_dir "$OUTPUT_DIR" \
  "$@"
