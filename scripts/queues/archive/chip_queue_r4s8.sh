#!/usr/bin/env bash
# r4s8: clean re-measure of the omni bf16 meta-batch sweep — the r4s6b
# rows overlapped concurrent pytest CPU load on the 1-core host (the
# r4s7 clean re-run of mb16 read 6.41 ms vs the contaminated 10.38).
# NOTHING else may run during this queue.
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s8
mkdir -p "$LOGDIR"
echo "chip_queue_r4s8: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" | tee -a "$LOGDIR/queue.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo "=== $name: exit=$rc ${dt}s" | tee -a "$LOGDIR/queue.log"
  tail -2 "$LOGDIR/$name.log" | sed 's/^/    /'
  return $rc
}
run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "chip_queue_r4s8: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"; exit 1; }
for MB in 8 32 64 128; do
  run omni_bf16_mb$MB 1800 python scripts/roofline.py --config maml_omni \
      --bf16 --meta_batch $MB --time --mem
done
# clean anil mb8/mb64 rows too (r4s6b's overlapped the suite-populate tail)
run anil_bf16_mb8 2400 python scripts/roofline.py --config anil_min --bf16 --meta_batch 8 --time --mem
run anil_bf16_mb64 2400 python scripts/roofline.py --config anil_min --bf16 --meta_batch 64 --time --mem
echo "chip_queue_r4s8: DONE" | tee -a "$LOGDIR/queue.log"
