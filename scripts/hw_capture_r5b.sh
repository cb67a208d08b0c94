#!/bin/bash
# Hardware measurement queue, round-5 continuation.  Run when the axon
# relay is up:   bash scripts/hw_capture_r5b.sh [outdir]
#
# Captures the DRN-D-54 serving triple — dense / block128reg / block128
# raw at 87.5% — completing the serving depth ladder (d22 and d38 rows
# are in runs/hw_r04 and runs/hw_r04b).  Same idempotent pattern as
# scripts/hw_capture.sh: re-run after a relay flap and only failed jobs
# redo.  Quiet-host rule applies (verify skill, round-4 lesson).
set -u
OUT=${1:-runs/hw_r05b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
VID=/root/reference/Road_1101.mp4
[ -f "$VID" ] || VID=shapes   # zero-asset fallback

INCOMPLETE=0
run() {
  local name=$1; shift
  if [ -f "$OUT/$name.ok" ]; then
    echo "=== $name: already captured, skipping"
    return 0
  fi
  echo "=== $name: $* (started $(date +%H:%M:%S))"
  timeout 2400 "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ] && grep -q '^{' "$OUT/$name.log"; then
    grep -h '^{' "$OUT/$name.log" | sed "s/^{/{\"job\": \"$name\", /" \
      >> "$OUT/summary.jsonl"
    touch "$OUT/$name.ok"
  else
    INCOMPLETE=1
  fi
  echo "=== $name: rc=$rc"
}

# DRN-D-54 serving triple (batch 8, same harness as the d22/d38 rows)
run d54_dense python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps
run d54_reg   python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps \
  --pr-config-path optimal_configs/drn_d_54/drn_d_54_block128reg_87.50.json
run d54_raw   python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps \
  --pr-config-path optimal_configs/drn_d_54/drn_d_54_block128_87.50.json

# Mode probe: exact's per-out-block programs multiply HLO op count; d54
# (bottleneck, 35 lowered layers, up to 16 out-blocks each) is where the
# ~0.4 ms/op in-scan overhead could eat the sparse win (round-3 lesson).
# (Measured: split == exact at 65.4; the real cause was the 1x1 gather —
# see scripts/r5_d54_decomp*.py and PERF_NOTES round 5.)
run d54_reg_split python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps \
  --pr-config-path optimal_configs/drn_d_54/drn_d_54_block128reg_87.50.json \
  --gathered-mode split

if [ $INCOMPLETE -ne 0 ]; then
  echo "INCOMPLETE: at least one job failed (re-run to retry)"
  exit 1
fi
echo "ALL CAPTURED -> $OUT/summary.jsonl"
