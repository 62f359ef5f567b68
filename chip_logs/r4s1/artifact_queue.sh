#!/usr/bin/env bash
# Round-4 item 7: reference-budget Particles2D MAML-TRPO artifact
# (reference rl/maml_trpo.py:26,36 - 500 iterations, meta-batch 20),
# fused path, then a 3-seed vmapped sweep for the confidence band.
set -u
cd /root/repo
LOGDIR=chip_logs/r4s1
run() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" | tee -a "$LOGDIR/queue.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
  local rc=$? dt=$((SECONDS - t0))
  echo "=== $name: exit=$rc ${dt}s" | tee -a "$LOGDIR/queue.log"
}
run probe 300 python -c "import jax; print(jax.devices())" || exit 1
run trpo_ref_budget 3600 python scripts/maml_trpo.py \
  --num_iterations 500 --meta_batch_size 20 --adapt_batch_size 20 \
  --max_path_length 100 --fuse 10 --n_eval_tasks 40 --save_every 100
run trpo_sweep_vmap 5400 python scripts/sweep.py maml_trpo \
  --seeds 42,7,123 --vmap_seeds --num_iterations 500 \
  --meta_batch_size 20 --adapt_batch_size 20 --max_path_length 100 \
  --fuse 10 --n_eval_tasks 40
echo "queue DONE" | tee -a "$LOGDIR/queue.log"
