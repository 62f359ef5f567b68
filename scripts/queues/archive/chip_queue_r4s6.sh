#!/usr/bin/env bash
# r4s6 chip window: validate the per-block CNN4 Pallas mode at
# production shapes (the whole-base programs SIGKILL the remote compile
# helper for every stage past fwd — r4s5 isolate logs — and the fwd
# kernel alone executed in 534 s, so whole mode is dead at bench scale),
# then A/B it end-to-end:
#   1) block-mode compile bisect (fwd -> grad -> adapt -> meta @32)
#   2) bench maml_omni with --conv_impl pallas (block), f32 + bf16
#   3) roofline GB/iter with the fused blocks vs direct
#   4) on-chip pallas suite (updated: both kernel modes + conditioned
#      second-order test)
# Launch detached:  setsid nohup bash scripts/chip_queue_r4s6.sh & echo $! > /tmp/r4s6_queue.pid
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s6
mkdir -p "$LOGDIR"
echo "chip_queue_r4s6: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"

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
  echo "chip_queue_r4s6: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

# 1) block-mode compile bisect (fresh process each; EMT_CNN4_PALLAS=block
#    routes pallas/cnn4_pallas.py to the per-block Mosaic programs).
run blk_isolate_fwd_32   1200 env EMT_CNN4_PALLAS=block python scripts/pallas_isolate.py --stage fwd   --meta_batch 32
run blk_isolate_grad_32  1800 env EMT_CNN4_PALLAS=block python scripts/pallas_isolate.py --stage grad  --meta_batch 32
run blk_isolate_adapt_32 1800 env EMT_CNN4_PALLAS=block python scripts/pallas_isolate.py --stage adapt --meta_batch 32
run blk_isolate_meta_32  2400 env EMT_CNN4_PALLAS=block python scripts/pallas_isolate.py --stage meta  --meta_batch 32

# 2) end-to-end bench A/B (block mode; default rows for comparison are
#    in BENCH_FULL: maml_omni direct f32 4,943-4,999 tasks/sec).
run bench_omni_blk      2400 env EMT_CNN4_PALLAS=block EMT_BENCH_CONV=pallas python bench.py --config maml_omni
run bench_omni_blk_bf16 2400 env EMT_CNN4_PALLAS=block EMT_BENCH_CONV=pallas EMT_BENCH_BF16=1 python bench.py --config maml_omni
run bench_omni_bf16_ref 2400 env EMT_BENCH_BF16=1 python bench.py --config maml_omni

# 3) roofline: logical bytes + wall-clock, fused blocks vs direct.
run roofline_omni_blk      2400 env EMT_CNN4_PALLAS=block python scripts/roofline.py --config maml_omni --conv_impl pallas --time
run roofline_omni_blk_bf16 2400 env EMT_CNN4_PALLAS=block python scripts/roofline.py --config maml_omni --conv_impl pallas --bf16 --time

# 4) on-chip pallas suite (cnn4 tests now cover whole+block; rollout
#    tests unchanged — skip via -k to keep the window short).
run pallas_cnn4_tpu 5400 env EMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q -k "cnn4"

echo "chip_queue_r4s6: DONE" | tee -a "$LOGDIR/queue.log"
