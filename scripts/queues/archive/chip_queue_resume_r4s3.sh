#!/usr/bin/env bash
# Resume of scripts/chip_queue.sh for the r4s3 window: the original queue
# was killed at a session boundary right after pallas_tpu passed (4 passed,
# 1426s — log chip_logs/r4s3/pallas_tpu.log). This picks up at the A/B
# steps and STOPS BEFORE bench_all so default-flip decisions can be made
# interactively first. Launch detached:  setsid nohup bash scripts/chip_queue_resume_r4s3.sh &
set -u
cd "$(dirname "$0")/.."
LOGDIR=chip_logs/r4s3
mkdir -p "$LOGDIR"
echo "chip_queue_resume: logging to $LOGDIR" | tee -a "$LOGDIR/queue.log"

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
  echo "chip_queue_resume: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

# stage-11 fused CNN4 A/B on the headline vision config
run bench_omni_direct 1800 python bench.py --config maml_omni
run bench_omni_pallas 1800 env EMT_BENCH_CONV=pallas python bench.py --config maml_omni

# rooflines for the pallas lowering (GB/iter before/after)
run roofline_omni_pallas      1200 python scripts/roofline.py --config maml_omni --conv_impl pallas --time
run roofline_omni_pallas_bf16 1200 python scripts/roofline.py --config maml_omni --conv_impl pallas --bf16 --time

# benchmark-or-prune A/Bs for the existing Pallas kernels (VERDICT r3 item 5)
run bench_trpo_gae_off 1800 env EMT_GAE_PALLAS=0 python bench.py --config trpo_particles
run bench_trpo_rollout_pallas 1800 env EMT_BENCH_ROLLOUT=pallas python bench.py --config trpo_particles

# native pool scaling row (backend-free but record on-chip for consistency)
run bench_native_pool 600 python bench.py --config native_pool_sleep

echo "chip_queue_resume: DONE (bench_all deliberately NOT run — flip defaults first)" | tee -a "$LOGDIR/queue.log"
