#!/bin/bash
# Round-5 TPU queue, third wave (run AFTER tools/tpu_queue_r5b.sh):
#   1. cdf_tune    — right-size the CDF speed tier's ray-compaction
#                    capacity under the 32^3 mask (keep-fraction
#                    measurement + capacity ladder + tuned parity
#                    artifact) — the 7.77 -> >=8 fps candidate.
#   2. baked_bench — baked-field render fps row (bakes the hashgrid-CDF
#                    gate at 256^3 on the fly; quality side is the r5b
#                    baked_parity.json artifacts).
#   3. full_bench  — complete bench.py pass: the round-5 numbers
#                    preview (the driver re-runs this at round end).
#
# Usage: bash tools/tpu_queue_r5c.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5c_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r5c_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

# r5b stages 1-2 re-run: the first attempt shipped 256K-sample bake
# chunks that the axon compile relay rejects (HTTP 413); bake_field now
# chunks at 64K.
run bake_hashgrid 2400 $T -m tnerf.cli bake \
  --config runs/hard_r3_hashgrid_cdf/config.json \
  -o logging.out_dir=runs/hard_r3_hashgrid_cdf \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 256 --eval

run bake_triplane 2400 $T -m tnerf.cli bake \
  --config runs/hard_r3_triplane_prog/config.json \
  -o logging.out_dir=runs/hard_r3_triplane_prog \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 256 --eval

run bake_cp 2400 $T -m tnerf.cli bake \
  --config runs/hard_r4_cp/config.json \
  -o logging.out_dir=runs/hard_r4_cp \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 256 --eval

run cdf_tune 2700 $T tools/cdf_tier_tune.py

run baked_bench 2400 $T -c "import bench, json; print('BAKED_BENCH ' + json.dumps(bench.bench_baked_render()))"

# r5b stage 4 re-run (transient TPU FailedPrecondition mid-run)
run loop_breakdown 3600 $T tools/loop_breakdown.py 600

run full_bench 5400 $T bench.py

echo "r5c queue drained ($(date -u +%H:%M:%S))" >&2
