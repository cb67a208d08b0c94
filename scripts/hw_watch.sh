#!/bin/bash
# Probe the axon relay every ~10 min; whenever it answers, (re)run the
# round-4 hardware capture queue (scripts/hw_capture.sh).  The queue is
# idempotent (per-job .ok markers), so a relay flap mid-capture only
# costs the unfinished jobs — the watcher keeps re-firing until the
# queue reports complete (exit 0) or the probe budget runs out.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/hw_r04}
mkdir -p "$OUT"
for i in $(seq 1 60); do
  echo "probe $i $(date +%H:%M:%S)"
  if timeout 1200 python -c "import jax; d=jax.devices(); assert d[0].platform != 'cpu', d; print(d)" \
      > "$OUT/probe.log" 2>&1; then
    echo "relay UP at $(date +%H:%M:%S); running capture queue"
    if bash scripts/hw_capture.sh "$OUT"; then
      echo "capture queue COMPLETE at $(date +%H:%M:%S)"
      exit 0
    fi
    echo "capture queue incomplete (relay flap?); will re-probe"
  fi
  sleep 600
done
echo "probe budget exhausted; queue incomplete"
exit 1
