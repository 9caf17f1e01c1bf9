#!/bin/bash
# Batch-launch every experiment script in this directory with a small gap —
# the reference's run_exp.sh (sbatch loop) without the scheduler dependency.
set -euo pipefail
cd "$(dirname "$0")"
for f in exp_*.sh; do
  [ -e "$f" ] || continue
  echo "launching $f"
  bash "$f" &
  sleep 10
done
wait
