#!/usr/bin/env bash
# One-shot runner for the queued on-chip measurements (BASELINE.md
# "Round 3, session 3 note"). The TPU tunnel flaps for hours at a time,
# so when a window opens every queued measurement must run unattended,
# serially (NEVER two TPU-touching python processes at once — the tunnel
# serializes and both look hung), each step bounded by a timeout and
# logged.  Usage:  bash scripts/chip_queue.sh [logdir]
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

# 1. regenerate BENCH_FULL.json FIRST — it is the round artifact (the
#    committed one has precision-leaked trpo/host rows, fixed in 35d4dd9,
#    and predates the serve_rl config); if the tunnel flaps mid-queue the
#    most valuable capture must already be on disk
run bench_all 5400 python bench.py --all

# 2. default-flip candidates next — a measured win here changes defaults
#    before the driver's end-of-round bench
# 2a. s2d conv lowering A/B on the headline config
run bench_s2d 1800 env EMT_BENCH_S2D=1 python bench.py --config maml_omni
# 2b. fused-chunk sweep on the trpo config (is EMT_BENCH_FUSE=10 optimal?)
run bench_trpo_fuse25 1800 env EMT_BENCH_FUSE=25 python bench.py --config trpo_particles
# 2c. RL bf16 A/B (parity-gated; win/no-win goes to BASELINE.md either way)
run bench_trpo_bf16 1800 env EMT_BENCH_BF16=1 python bench.py --config trpo_particles

# 3. TPU-only Pallas tests (incl. the fused-rollout per-task-sigma
#    regression added in round 3 session 3 — never yet run on chip)
run pallas_tpu 1800 env EMT_TEST_TPU=1 python -m pytest tests/test_pallas_tpu.py -q

# 4. reproducible rooflines (replace the ad-hoc BASELINE.md numbers)
run roofline_omni      1200 python scripts/roofline.py --config maml_omni --time
run roofline_omni_bf16 1200 python scripts/roofline.py --config maml_omni --bf16 --time
run roofline_anil      1200 python scripts/roofline.py --config anil_min --time
run roofline_anil_bf16 1200 python scripts/roofline.py --config anil_min --bf16 --time

# 4b. phase-time profile of a reference-scale MAML-TRPO run (where do the
#     ~37 ms/iteration go: collect vs CG/line-search outer?) — the input
#     for the next RL perf push; phase_times.json lands in the run dir.
run profile_trpo 2400 python scripts/maml_trpo.py --num_iterations 20 \
  --meta_batch_size 20 --adapt_batch_size 20 --max_path_length 100 \
  --n_eval_tasks 10 --save_every 50 --profile

# 4c. multi-seed sweep as one vmapped program (sweep --vmap_seeds):
#     seed-iterations/sec vs the serial per-seed loop over the same
#     fused scan; on 1-core CPU the ratio is 1.03x — the chip gap
#     (MXU under-fill at per-seed batch sizes) is the point.
#     NOTE: bench_all above also covers this config; this standalone run
#     is the fallback if bench_all times out partway.
run bench_multiseed 1800 python bench.py --config multiseed_trpo

echo "chip_queue: DONE" | tee -a "$LOGDIR/queue.log"
