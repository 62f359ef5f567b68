#!/usr/bin/env bash
# Serial runner for queued on-chip measurements. The TPU tunnel flaps for
# hours at a time, so when a window opens every queued measurement must run
# unattended, serially (NEVER two TPU-touching python processes at once —
# the tunnel serializes and both look hung), each step bounded by a timeout
# and logged.
#
# Usage:  bash scripts/chip_queue.sh <queuefile> [logdir]
#
# <queuefile> is a bash fragment (see scripts/queues/) that calls the
# `run <name> <timeout_s> <cmd...>` helper defined here. Past rounds'
# queues are archived under scripts/queues/archive/.
set -u
cd "$(dirname "$0")/.."
QUEUE=${1:?usage: chip_queue.sh <queuefile> [logdir]}
# Resolve + validate BEFORE doing anything: a typo'd or cwd-relative path
# must fail loudly here, not fall through `source` to the DONE line (which
# chain_queue.sh/tunnel_watch.sh would read as a completed run).
[ -r "$QUEUE" ] || {
  echo "chip_queue: ERROR queue file not readable: $QUEUE (cwd is repo root)" >&2
  exit 2
}
LOGDIR=${2:-chip_logs/$(date +%m%d_%H%M)}
mkdir -p "$LOGDIR"
echo "chip_queue: queue=$QUEUE logging to $LOGDIR"

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

# probe — abort the whole queue if the tunnel is down (hang, not error)
run probe 300 python -c "import jax; print(jax.devices())" || {
  echo "chip_queue: tunnel DOWN, aborting" | tee -a "$LOGDIR/queue.log"
  exit 1
}

source "$QUEUE"

echo "chip_queue: DONE" | tee -a "$LOGDIR/queue.log"
