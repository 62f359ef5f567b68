#!/usr/bin/env bash
# Launcher for the r5s5 quiet-box bench re-measure (chained behind r5s4
# by scripts/chain_queue.sh). Waits for the background full test suite
# (CPU) to exit first so the 1-core box is quiet — the whole point of
# the re-measure is removing host-CPU contention from the host-env rows.
set -u
cd "$(dirname "$0")/../.."
if [ -f /tmp/full_suite.pid ]; then
  P=$(cat /tmp/full_suite.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 30; done
fi
exec bash scripts/chip_queue.sh scripts/queues/r5s5_bench_quiet.sh chip_logs/r5s5
