#!/bin/bash
# Probe the axon relay every ~10 min; when it answers, run the round-4
# hardware capture queue (scripts/hw_capture.sh).  Designed to run in the
# background for hours: logs every probe, runs the queue AT MOST once.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-runs/hw_r04}
mkdir -p "$OUT"
for i in $(seq 1 60); do
  echo "probe $i $(date +%H:%M:%S)"
  if timeout 1200 python -c "import jax; d=jax.devices(); assert d[0].platform != 'cpu', d; print(d)" \
      > "$OUT/probe.log" 2>&1; then
    echo "relay UP at $(date +%H:%M:%S); starting capture queue"
    bash scripts/hw_capture.sh "$OUT"
    exit $?
  fi
  sleep 600
done
echo "relay never came up in 60 probes"
exit 1
