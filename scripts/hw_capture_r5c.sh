#!/bin/bash
# Hardware measurement queue, round-5 continuation C.  Run when the axon
# relay is up:   bash scripts/hw_capture_r5c.sh [outdir]
#
# Re-captures the serving depth ladder (dense / block128reg 87.5% pairs at
# d22 / d38 / d54) through the shipped CLI after the 1x1 gathered
# eligibility rule landed (sparse_exec.GATHER_1X1_MAX_DENSITY): mid/high-
# density 1x1 convs without dead out-blocks now stay masked-dense (their
# gather measured 0.92x dense on d54 — PERF_NOTES round 5).  Same-session
# dense siblings for every ratio; idempotent re-run pattern.
set -u
OUT=${1:-runs/hw_r05c}
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

for arch in drn_d_22 drn_d_38 drn_d_54; do
  run ${arch}_dense python -u -m tpuseg.cli.seg_video --video "$VID" \
    --size 1024x2048 --frames 32 --batch 8 --arch $arch --device-fps
  run ${arch}_reg python -u -m tpuseg.cli.seg_video --video "$VID" \
    --size 1024x2048 --frames 32 --batch 8 --arch $arch --device-fps \
    --pr-config-path optimal_configs/$arch/${arch}_block128reg_87.50.json
done

# Composition at depth: int8 on the rule-filtered d54 reg plan set (the
# excluded 1x1s now take the dense PTQ path).  Sibling pair d54_dense2 /
# d54_reg2 in the same session for the ratios.
run d54_dense2 python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps
run d54_reg2 python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps \
  --pr-config-path optimal_configs/drn_d_54/drn_d_54_block128reg_87.50.json
run d54_reg2_i8 python -u -m tpuseg.cli.seg_video --video "$VID" \
  --size 1024x2048 --frames 32 --batch 8 --arch drn_d_54 --device-fps \
  --pr-config-path optimal_configs/drn_d_54/drn_d_54_block128reg_87.50.json \
  --quantize --calibrate 8

if [ $INCOMPLETE -ne 0 ]; then
  echo "INCOMPLETE: at least one job failed (re-run to retry)"
  exit 1
fi
echo "ALL CAPTURED -> $OUT/summary.jsonl"
