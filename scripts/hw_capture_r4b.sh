#!/bin/bash
# Hardware measurement queue, round-4 continuation B.  Run when the axon
# relay is up:   bash scripts/hw_capture_r4b.sh [outdir]
#
# New numbers this queue captures (same idempotent pattern as
# scripts/hw_capture.sh — re-run after a relay flap and only failed jobs
# redo):
#   1. DRN-D-38 serving: dense / block128reg / block128 raw at 87.5%
#      (third arch point for the README serving table)
#   2. sparse x int8 x temporal compositions on DRN-D-22 block128reg —
#      the "full stack" serving rows the mode table lacks
#   3. classifier remat: compiler-reported HBM (memory_analysis) for the
#      KD train step with/without --remat at a large batch
set -u
OUT=${1:-runs/hw_r04b}
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

# 1. DRN-D-38 serving triple (batch 8, same harness as the d22/d54 rows)
run d38_dense python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_38 --device-fps
run d38_reg   python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_38 --device-fps \
  --pr-config-path optimal_configs/drn_d_38/drn_d_38_block128reg_87.50.json
run d38_raw   python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_38 --device-fps \
  --pr-config-path optimal_configs/drn_d_38/drn_d_38_block128_87.50.json

# 2. full-stack compositions (DRN-D-22, fidelity-preserving reg masks).
#    Same-session sibling baseline first (cross-session spread lesson).
CFG=optimal_configs/drn_d_22/drn_d_22_block128reg_87.50.json
run d22_reg       python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --device-fps \
  --pr-config-path "$CFG"
run d22_reg_i8    python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --device-fps \
  --pr-config-path "$CFG" --quantize --calibrate 8
run d22_reg_i8_budget python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 64 --batch 32 --device-fps --temporal-report \
  --pr-config-path "$CFG" --quantize --calibrate 8 \
  --temporal-thresh 8 --temporal-budget 8
run d22_reg_i8_budget_warp python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 64 --batch 32 --device-fps --temporal-report \
  --pr-config-path "$CFG" --quantize --calibrate 8 \
  --temporal-thresh 8 --temporal-budget 8 --temporal-warp

# 3. classifier remat HBM (compile-only: compiler memory analysis)
run remat_mem python -u -m tpuseg.tools.remat_mem

echo "=== queue done (incomplete=$INCOMPLETE); summary:"
cat "$OUT/summary.jsonl" 2>/dev/null
exit $INCOMPLETE
