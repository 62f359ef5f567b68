#!/usr/bin/env bash
# Chain a chip queue behind a running one: wait for "DONE" (or the pid
# exiting) on the first queue, then launch the second. NEVER two
# TPU-touching python processes at once — this enforces the serial rule
# across queue scripts.
# Usage: setsid nohup bash scripts/chain_queue.sh <pidfile> <donelog> <next_script> &
set -u
PIDFILE=$1; DONELOG=$2; NEXT=$3
# Validate the NEXT queue at launch — discovering a typo when the first
# queue finishes wastes the rest of the tunnel window.
[ -r "$NEXT" ] || {
  echo "chain_queue: ERROR next queue file not readable: $NEXT" >&2
  exit 2
}
# PITFALL: `setsid nohup bash q.sh & echo $! > pidfile` records the pid of
# the setsid LAUNCHER, which forks and exits immediately — the dead-pid
# check would then fire the next queue while the first still runs (two TPU
# processes). The pidfile must hold the real `bash q.sh` pid (ps aux).
# Defense below: only trust pid-death after seeing the pid ALIVE once.
SEEN_ALIVE=0
# Queue logs are appended (tee -a), so a stale "DONE" from a previous run
# of the same queue must not fire the chain early: record the donelog
# length at chain start and only match DONE lines appended after launch.
BASE_LINES=$(wc -l <"$DONELOG" 2>/dev/null || echo 0)
while true; do
  if tail -n "+$((BASE_LINES + 1))" "$DONELOG" 2>/dev/null \
      | grep -q "DONE"; then break; fi
  PID=$(cat "$PIDFILE" 2>/dev/null || echo "")
  if [ -n "$PID" ]; then
    if kill -0 "$PID" 2>/dev/null; then
      SEEN_ALIVE=1
    elif [ "$SEEN_ALIVE" = 1 ]; then
      break
    fi
  fi
  sleep 60
done
sleep 10
exec bash "$NEXT"
