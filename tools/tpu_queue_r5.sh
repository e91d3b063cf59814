#!/bin/bash
# Round-5 TPU queue, first wave: adjudicate the 32^3 in-kernel
# occupancy bitfield (render.fused_coarse_res, pallas_fused2) — the
# round-4 verdict's top item (close the >=8 fps @ <=0.5 dB render gate;
# turbo's 0.803 dB parity failure was the 16^3 coarse-vs-fine mask
# divergence).
#   1. fused_bench   — fused render tiers + train rates under the NEW
#                      protocol of record (3-run spread) + MFU rows,
#                      all with the 32^3 mask.
#   2. parity_turbo  — same-checkpoint parity of the turbo tier
#                      (rpc=4, S=32 uniform, runs/hard_r3_fused_rpc4)
#                      re-rendered with the finer mask: the round-4
#                      0.803 dB failure case.
#   3. parity_p32    — CDF speed tier (runs/hard_r4_fused_cdf_p32).
#   4. parity_cdf2   — CDF flagship tier (runs/hard_r4_fused_cdf2).
#   5. cp_parity     — CP-family compaction-exactness artifact: the
#                      gate render (compacted, capacity knobs) vs the
#                      dense march render of the SAME checkpoint —
#                      fills the configs/README CP parity cell.
#   6. retrain_p32   — clean speed-tier gate trained END-TO-END with
#                      the 32^3 mask (floor 30.0 inherited from the
#                      preset — intentional, r4 verdict weak #3).
#   7. parity_p32_r5 — parity artifact for the fresh gate.
#   8. ref_march8    — march pipeline at the REFERENCE's own 8^3 grid
#                      (main.cu:394): the missing reference_parity
#                      measured row.  Floor 28 is intentional: the
#                      8^3-intervals gate measured 30.15/29.33, march
#                      at the same granularity should clear 28 easily;
#                      a red here means a real regression.
#
# Usage: bash tools/tpu_queue_r5.sh [start_stage]   (starts AT stage N)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r5_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

run fused_bench 2700 $T -c "import bench, json; print('FUSED_BENCH ' + json.dumps({**bench.bench_fused_render(), **bench.bench_fused_train()}))"

run parity_turbo 1500 $T tools/render_parity.py \
  --config runs/hard_r3_fused_rpc4/config.json --run runs/hard_r3_fused_rpc4

run parity_p32 1500 $T tools/render_parity.py \
  --config configs/procedural_hard_fused_cdf.json --run runs/hard_r4_fused_cdf_p32

run parity_cdf2 1500 $T tools/render_parity.py \
  --config configs/procedural_hard_fused_cdf2.json --run runs/hard_r4_fused_cdf2

run cp_parity 1800 $T tools/render_parity.py \
  --config runs/hard_r4_cp/config.json --run runs/hard_r4_cp \
  --out render_parity_compaction.json \
  --march-overrides render.compact=false render.ray_compact=false

run retrain_p32 2400 $T -m tnerf.cli train \
  --config configs/procedural_hard_fused_cdf.json \
  --out runs/hard_r5_fused_cdf_p32

run parity_p32_r5 1500 $T tools/render_parity.py \
  --config configs/procedural_hard_fused_cdf.json --run runs/hard_r5_fused_cdf_p32

run ref_march8 2400 $T -m tnerf.cli train \
  --config configs/procedural_hard_30db.json \
  -o grid.resolution=8 -o train.assert_test_psnr_min=28 \
  --out runs/hard_r5_march8

echo "r5 queue drained ($(date -u +%H:%M:%S))" >&2
