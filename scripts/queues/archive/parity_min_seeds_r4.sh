#!/usr/bin/env bash
# VERDICT r3 item 3: MAML Mini-ImageNet-shaped parity at extra seeds
# (seed 42 @250 iters already in BASELINE.md). CPU-only (EMT_FORCE_CPU),
# nice'd so a concurrent chip queue keeps host priority.
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s4
mkdir -p "$LOGDIR"
for seed in 7 123; do
  echo "=== parity_min_maml seed=$seed start $(date +%T)" | tee -a "$LOGDIR/parity_min.log"
  EMT_FORCE_CPU=1 nice -n 19 timeout 14400 \
    python scripts/parity_check.py --dataset min --iters 250 --meta_batch 8 \
      --inner_lr 0.1 --seed "$seed" \
      >"$LOGDIR/parity_min_maml_s$seed.log" 2>&1
  echo "=== parity_min_maml seed=$seed exit=$? $(date +%T)" | tee -a "$LOGDIR/parity_min.log"
done
echo "parity_min_seeds_r4: DONE" | tee -a "$LOGDIR/parity_min.log"
