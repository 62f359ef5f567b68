#!/usr/bin/env bash
# r4s6b chip window: pin the measured-to-bound roofline residual
# (VERDICT r3 item 4: 18% on maml_omni bf16, 29% on anil_min bf16,
# 64% on anil_min f32 — r3s6 logs).
#
# Two hypotheses, two instruments:
#   1) fixed per-program overhead (dispatch / scan prologue / tunnel) —
#      meta-batch sweep: fit t(mb) = a + b*mb; a is the fixed cost, and
#      efficiency at mb=128 tells whether the residual amortizes away.
#   2) layout padding (3-channel RGB input, 32-channel conv stacks pad
#      to 128 lanes -> physical HBM traffic > logical cost-analysis
#      bytes) — roofline --mem prints XLA memory_analysis physical
#      buffer sizes next to the logical bytes.
#
# Launch detached: setsid nohup bash scripts/chip_queue_r4s6b.sh &
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s6b
mkdir -p "$LOGDIR"
echo "chip_queue_r4s6b: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"

run() {  # run <name> <timeout_s> <cmd...>
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
  echo "chip_queue_r4s6b: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

# 1) meta-batch sweep, flagship omni bf16 (bound scales ~linearly in mb;
#    a constant offset in measured-vs-bound across mb = fixed overhead).
for MB in 8 16 32 64 128; do
  run omni_bf16_mb$MB 1800 python scripts/roofline.py --config maml_omni \
      --bf16 --meta_batch $MB --time --mem
done

# 2) anil_min bf16 sweep (bigger residual, bigger program).
for MB in 8 16 32 64; do
  run anil_bf16_mb$MB 2400 python scripts/roofline.py --config anil_min \
      --bf16 --meta_batch $MB --time --mem
done

# 3) f32 rows at the headline mb for the padding multiplier comparison
#    (f32 tiles (8,128) vs bf16 (16,128): padding hypothesis predicts a
#    larger physical/logical gap for f32, matching its worse 61%).
run omni_f32_mb32 1800 python scripts/roofline.py --config maml_omni --meta_batch 32 --time --mem
run anil_f32_mb32 2400 python scripts/roofline.py --config anil_min --meta_batch 32 --time --mem

echo "chip_queue_r4s6b: DONE" | tee -a "$LOGDIR/queue.log"
