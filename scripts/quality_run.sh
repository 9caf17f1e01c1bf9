#!/bin/bash
# Quality-record runs on the synthetic chart set (BASELINE.md). Environment
# knobs:
#   BATCH   (default 4)     training batch size
#   VERSION (default 2)     loss version (2 = GP + pan-perceptual config)
#   EPOCHS  (default 30)
#   LAMBDA_PER (default "") extra --lambda_per override ("" = flag default)
#   TAG     (default quality_b$BATCH_v$VERSION)
#   WORK    (default /tmp/quality_run)
#
# Round-5 record configs (VERDICT r4 item 3):
#   BATCH=4  VERSION=2                 ./scripts/quality_run.sh   # shipped b4
#   BATCH=16 VERSION=2                 ./scripts/quality_run.sh   # shipped b16
#   BATCH=4  VERSION=1 LAMBDA_PER=1    ./scripts/quality_run.sh   # reference
#       default flag set (random-VGG perceptual fallback in this env)
set -euo pipefail
WORK=${WORK:-/tmp/quality_run}
BATCH=${BATCH:-4}
VERSION=${VERSION:-2}
EPOCHS=${EPOCHS:-30}
TAG=${TAG:-quality_b${BATCH}_v${VERSION}}
REPO=$(cd "$(dirname "$0")/.." && pwd)
cd "$REPO"
if [ ! -d "$WORK/data/train/source" ]; then
  python scripts/make_synth_dataset.py --out "$WORK/data" \
    --n_train 96 --n_test 16
fi
EXTRA=()
if [ -n "${LAMBDA_PER:-}" ]; then EXTRA+=(--lambda_per "$LAMBDA_PER"); fi
python train.py --data "$WORK/data" --gen UNet++ --nf 64 \
  --batch_size "$BATCH" --total_epochs "$EPOCHS" --epoch_constant 10 \
  --version "$VERSION" --lambda_gp 0.01 \
  --folder_save "$TAG" --folder_load "$TAG" "${EXTRA[@]}"
python test.py --folder "$TAG" --work_root "$WORK"
cat "$WORK/Outputs/$TAG/eval.txt"
