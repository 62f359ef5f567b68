#!/usr/bin/env bash
# r4s5 chip window: (1) verify the rollout-kernel VMEM-layout fix
# (per-coordinate [T, L] outputs — r4s3's bench OOM'd the 16 MiB scoped
# VMEM at L=400), (2) re-run the rollout-pallas A/B, (3) bisect the
# fused-CNN4 compile-helper SIGKILL with scripts/pallas_isolate.py.
# Launch detached:  setsid nohup bash scripts/chip_queue_r4s5.sh & echo $! > /tmp/r4s5_queue.pid
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s5
mkdir -p "$LOGDIR"
echo "chip_queue_r4s5: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"

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
  echo "chip_queue_r4s5: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

# 1) rollout-kernel layout fix: on-chip unit tests (replay parity, vmap
#    per-task params, sigma lanes), then the bench shape that OOM'd.
run pallas_rollout_tests 2400 env EMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q -k "rollout"
run bench_trpo_rollout_pallas 1800 env EMT_BENCH_ROLLOUT=pallas python bench.py --config trpo_particles

# 2) fused-CNN4 compile bisect, smallest stage first (fresh process each;
#    a SIGKILL'd helper poisons nothing).
run isolate_fwd_32  1200 python scripts/pallas_isolate.py --stage fwd   --meta_batch 32
run isolate_grad_32 1800 python scripts/pallas_isolate.py --stage grad  --meta_batch 32
run isolate_adapt_32 1800 python scripts/pallas_isolate.py --stage adapt --meta_batch 32
run isolate_meta_4  1800 python scripts/pallas_isolate.py --stage meta  --meta_batch 4
run isolate_meta_32 2400 python scripts/pallas_isolate.py --stage meta  --meta_batch 32

echo "chip_queue_r4s5: DONE" | tee -a "$LOGDIR/queue.log"
