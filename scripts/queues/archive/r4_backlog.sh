#!/usr/bin/env bash
# One-shot runner for the queued on-chip measurements (round 4 backlog).
# The TPU tunnel flaps for hours at a time, so when a window opens every
# queued measurement must run unattended, serially (NEVER two
# TPU-touching python processes at once — the tunnel serializes and both
# look hung), each step bounded by a timeout and logged.
# Usage:  bash scripts/chip_queue.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR=${1:-chip_logs/$(date +%m%d_%H%M)}
mkdir -p "$LOGDIR"
echo "chip_queue: logging to $LOGDIR"

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

# 0. probe — abort the whole queue if the tunnel is down (hang, not error)
run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "chip_queue: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

# 1. TPU-only Pallas tests — gate everything on the fused CNN4 kernel
#    compiling + matching on the real chip
run pallas_tpu 2400 env EMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q

# 2. stage-11 fused CNN4 A/B on the headline vision config
#    (win/no-win goes to BASELINE.md either way, per the s2d discipline)
run bench_omni_direct 1800 python bench.py --config maml_omni
run bench_omni_pallas 1800 env EMT_BENCH_CONV=pallas python bench.py --config maml_omni

# 3. rooflines for the pallas lowering (GB/iter before/after)
run roofline_omni_pallas      1200 python scripts/roofline.py --config maml_omni --conv_impl pallas --time
run roofline_omni_pallas_bf16 1200 python scripts/roofline.py --config maml_omni --conv_impl pallas --bf16 --time

# 4. benchmark-or-prune A/Bs for the existing Pallas kernels (VERDICT r3
#    item 5): GAE default-ON vs forced-OFF, fused rollout opt-in vs scan
run bench_trpo_gae_off 1800 env EMT_GAE_PALLAS=0 python bench.py --config trpo_particles
run bench_trpo_rollout_pallas 1800 env EMT_BENCH_ROLLOUT=pallas python bench.py --config trpo_particles

# 5. native pool scaling row (backend-free but record on-chip for
#    BENCH_FULL consistency)
run bench_native_pool 600 python bench.py --config native_pool_sleep

# 6. regenerate the full BENCH artifact with final defaults LAST
run bench_all 5400 python bench.py --all

echo "chip_queue: DONE" | tee -a "$LOGDIR/queue.log"
