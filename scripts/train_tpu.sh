#!/bin/bash
# TPU launch script — the equivalent of the reference's SLURM V100 script
# (/root/reference/gan_script.sh): stage the dataset to local disk, train the
# version-2 default config, then evaluate. Run on a TPU VM (single host; for
# multi-host pods launch the same script per worker — jax.distributed
# initializes from the TPU environment).
set -euo pipefail

DATA_TAR=${DATA_TAR:-"$HOME/data.tar"}
WORK=${WORK:-"${TMPDIR:-/tmp}/tactile_gan_run"}
REPO=$(cd "$(dirname "$0")/.." && pwd)

mkdir -p "$WORK"
if [ -f "$DATA_TAR" ]; then
  tar -xf "$DATA_TAR" -C "$WORK"
fi

cd "$REPO"
python train.py \
  --data "$WORK/data" \
  --version 2 \
  --folder_save "${FOLDER:-pix2obj}" \
  "$@"

python test.py --folder "${FOLDER:-pix2obj}" --work_root "$WORK"
