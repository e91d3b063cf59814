#!/bin/bash
# Round-4 coverage queue (after r4/r4b): gates for the two families
# without a committed 800x800 hard-gate run.
#   1. intervals — the REFERENCE's own pipeline shape (grid_intervals
#      over an 8^3 grid, 32 samples/interval = main.cu:394/sampler.h:4
#      semantics) trained end-to-end on the hard procedural gate scene.
#      Every other gate uses march/fused; this proves the C5-C7
#      interval path at scale, not just in unit tests.
#   2. cp — the TensoRF CP ablation family (field_.encoding=cp) at
#      rank 64; exploratory floor (assert 0), the measured number goes
#      in configs/README.
#
# Usage: bash tools/tpu_queue_r4c.sh [start_stage]   (starts AT stage N)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r4c_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r4c_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

run intervals 1800 $T -m tnerf.cli train --config configs/procedural_hard_30db.json \
  -o render.pipeline=grid_intervals -o grid.resolution=8 -o grid.max_hits=24 \
  -o sampler.samples_per_interval=32 -o sampler.tighten=false \
  -o sampler.tighten_res=0 -o sampler.occupancy_mask_res=0 \
  -o train.batch_size=4096 -o train.steps=2500 \
  --out runs/hard_r4_intervals

run cp 1800 $T -m tnerf.cli train --config configs/procedural_hard_triplane.json \
  -o field_.encoding=cp -o field_.tri_features=64 \
  -o train.assert_test_psnr_min=0 --out runs/hard_r4_cp

echo "r4c queue drained ($(date -u +%H:%M:%S))" >&2
