#!/usr/bin/env bash
# Probe the TPU tunnel every 15 min; the moment it answers, run the given
# measurement queue (scripts/chip_queue.sh <queuefile>) so even a short
# tunnel-up window is captured unattended. The tunnel's failure mode is an
# unbounded hang inside jax.devices(), so probes live in killable
# subprocesses. Exits after the queue runs, or after ~11h of downtime.
# Usage:  bash scripts/tunnel_watch.sh <queuefile> [max_probes]
set -u
cd "$(dirname "$0")/.."
QUEUE=${1:?usage: tunnel_watch.sh <queuefile> [max_probes]}
# Validate at LAUNCH, not at the first successful probe: a typo'd path
# discovered hours later wastes the whole tunnel-up window.
[ -r "$QUEUE" ] || {
  echo "tunnel_watch: ERROR queue file not readable: $QUEUE (cwd is repo root)" >&2
  exit 2
}
MAX=${2:-44}
for i in $(seq 1 "$MAX"); do
  if timeout 300 python -c "import jax; print(jax.devices())" \
      >/tmp/tunnel_probe.last 2>&1; then
    echo "tunnel UP at $(date) (probe #$i)"
    bash scripts/chip_queue.sh "$QUEUE" "chip_logs/auto_$(date +%m%d_%H%M)"
    exit $?
  fi
  echo "probe #$i down at $(date)"
  sleep 600
done
echo "tunnel never came up after $MAX probes"
exit 1
