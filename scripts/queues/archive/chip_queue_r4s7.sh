#!/usr/bin/env bash
# r4s7: re-measure the three r4s6b rows corrupted by concurrent pytest
# CPU load on the 1-core host (anil bf16 mb16/mb32 read 222/662 ms vs
# r3s6's 54.84 ms at identical config; omni bf16 mb16 read above mb32).
# Launch detached: setsid nohup bash scripts/chip_queue_r4s7.sh &
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s7
mkdir -p "$LOGDIR"
echo "chip_queue_r4s7: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" | tee -a "$LOGDIR/queue.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo "=== $name: exit=$rc ${dt}s" | tee -a "$LOGDIR/queue.log"
  tail -3 "$LOGDIR/$name.log" | sed 's/^/    /'
  return $rc
}
run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "chip_queue_r4s7: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"; exit 1; }
run anil_bf16_mb16 2400 python scripts/roofline.py --config anil_min --bf16 --meta_batch 16 --time --mem
run anil_bf16_mb32 2400 python scripts/roofline.py --config anil_min --bf16 --meta_batch 32 --time --mem
run omni_bf16_mb16 1800 python scripts/roofline.py --config maml_omni --bf16 --meta_batch 16 --time --mem
echo "chip_queue_r4s7: DONE" | tee -a "$LOGDIR/queue.log"
