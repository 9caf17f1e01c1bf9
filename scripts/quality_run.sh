#!/bin/bash
# Headline-config quality run on the synthetic chart set: UNet++ nf=64 b4
# 256², version-2 losses + GP, 30 epochs, then evaluate. Reproduces the
# BASELINE.md quality record (round 3: Dice 0.9956 / acc 0.993 at b4;
# 0.9905 at b16).
set -euo pipefail
WORK=${WORK:-/tmp/quality_run}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
if [ ! -d "$WORK/data/train/source" ]; then
  python scripts/make_synth_dataset.py --out "$WORK/data" \
    --n_train 96 --n_test 16
fi
python train.py --data "$WORK/data" --gen UNet++ --nf 64 --batch_size 4 \
  --total_epochs 30 --epoch_constant 10 --version 2 --lambda_gp 0.01 \
  --folder_save quality --folder_load quality
python test.py --folder quality --work_root "$WORK"
cat "$WORK/Outputs/quality/eval.txt"
