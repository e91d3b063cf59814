#!/bin/bash
# Round-4 TPU gate queue: drains the round-3 experiment wave that the
# round-3 TPU window cut off at stage 4 (VERDICT.md round 3, "Next
# round" #1) plus the two measurements it gated on:
#   - tools/measure_pallas_hash.py (T=2^14 AND T=2^19) — decides
#     hash_gather_mode routing (verdict #3, ADVICE medium),
#   - the fused turbo (rpc=4 S=32) gate retrain so its BENCH rows trace
#     to a committed run dir (verdict weak #6).
# Flagship gates (fused_rpc2 / march / hashgrid) are NOT retrained:
# their round-3 checkpoints are still on disk this session
# (runs/hard_r3_*/checkpoints), and metrics.jsonl is append-only so the
# committed numbers of record stand.
#
# Stages run serially on the one TPU chip; each is timeout-bounded and a
# failure logs rc and moves on (bench rows are guarded on the run dirs).
#
# Usage: bash tools/tpu_queue_r4.sh [start_stage]
#   start_stage N starts AT stage N (1-based); default 1.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r4_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r4_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

# -- 1. The last unmeasured kernel decision (pallas hash encode), both
#       table sizes of record (ADVICE medium: this was never queued)
run pallas_measure 1200 $T tools/measure_pallas_hash.py

# -- 2. Third field family gate (triplane / TensoRF-VM)
run triplane 1800 $T -m tnerf.cli train --config configs/procedural_hard_triplane.json

# -- 3-5. Hash-grid speed/quality levers (verdict #4: render >=4 fps at
#         41+ dB needs these winners)
run hashgrid_cdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o sampler.placement=occupancy_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=24 -o render.compact_fraction=0.95 \
  --out runs/hard_r3_hashgrid_cdf
run hashgrid_k6 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o field_.hash_nearest_levels=6 --out runs/hard_r3_hashgrid_k6
run hashgrid_best 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o field_.hash_nearest_levels=6 -o sampler.placement=occupancy_cdf \
  -o sampler.cdf_bins=64 -o sampler.samples_per_ray=24 \
  -o render.compact_fraction=0.95 --out runs/hard_r3_hashgrid_best

# -- 6-7. CDF sample-placement on the march gate (quadrature contract:
#         train with the placement the render row times)
run march_cdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_30db.json \
  -o sampler.placement=occupancy_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=48 --out runs/hard_r3_march_cdf
run march_dcdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_30db.json \
  -o sampler.placement=density_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=48 --out runs/hard_r3_march_dcdf

# -- 8. Remaining hash-grid CDF variant
run hashgrid_dcdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o sampler.placement=density_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=24 -o render.compact_fraction=0.95 \
  --out runs/hard_r3_hashgrid_dcdf

# -- 9. Progressive coarse-to-fine TensoRF recipe
run triplane_prog 1800 $T -m tnerf.cli train --config configs/procedural_hard_triplane.json \
  -o field_.tri_init_resolution=32 -o 'field_.tri_upsample_steps=[625,1250,1875]' \
  --out runs/hard_r3_triplane_prog

# -- 10. Fused turbo tier gate (rpc=4, S=32): gives the BENCH
#        gate_fused_turbo_* rows a committed run dir (verdict weak #6)
run fused_turbo 1500 $T -m tnerf.cli train --config configs/procedural_hard_fused.json \
  -o sampler.samples_per_ray=32 -o render.fused_train_rpc=4 \
  -o render.fused_rpc=4 --out runs/hard_r3_fused_rpc4

echo "queue drained ($(date -u +%H:%M:%S))" >&2
