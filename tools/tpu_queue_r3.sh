#!/bin/bash
# Round-3 TPU gate queue (reconstruction of the tunnel-outage queue,
# docs/ROUND3.md "Still queued"): retrains the flagship gates so their
# checkpoints exist on disk for bench.py's trained-occupancy render rows,
# produces the render-parity artifact, then runs the queued experiment
# gates (CDF placement, nearest-levels, triplane, progressive TensoRF).
# Stages run serially on the one TPU chip; each is timeout-bounded and a
# failure logs rc and moves on (bench rows are guarded on the run dirs).
#
# Usage: bash tools/tpu_queue_r3.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r3_status.jsonl
START=${1:-0}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ $((i - 1)) -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r3_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

# -- Flagship gate retrains (checkpoints feed bench's honest render rows)
run fused_rpc2 1500 $T -m tnerf.cli train --config configs/procedural_hard_fused.json
run parity 1200 $T tools/render_parity.py \
  --config configs/procedural_hard_fused.json --run runs/hard_r3_fused_rpc2
run march 1800 $T -m tnerf.cli train --config configs/procedural_hard_30db.json
run hashgrid 1800 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json

# -- Third field family gate (triplane / TensoRF-VM)
run triplane 1800 $T -m tnerf.cli train --config configs/procedural_hard_triplane.json

# -- CDF sample-placement experiment gates (quadrature contract: train
#    with the placement the render row times)
run march_cdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_30db.json \
  -o sampler.placement=occupancy_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=48 --out runs/hard_r3_march_cdf
run hashgrid_cdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o sampler.placement=occupancy_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=24 -o render.compact_fraction=0.95 \
  --out runs/hard_r3_hashgrid_cdf
run march_dcdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_30db.json \
  -o sampler.placement=density_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=48 --out runs/hard_r3_march_dcdf

# -- Nearest-interpolation coarse levels (tcnn 'Nearest' parity)
run hashgrid_k6 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o field_.hash_nearest_levels=6 --out runs/hard_r3_hashgrid_k6

# -- Progressive coarse-to-fine TensoRF recipe
run triplane_prog 1800 $T -m tnerf.cli train --config configs/procedural_hard_triplane.json \
  -o field_.tri_init_resolution=32 -o 'field_.tri_upsample_steps=[625,1250,1875]' \
  --out runs/hard_r3_triplane_prog

# -- Remaining experiment gates
run hashgrid_dcdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o sampler.placement=density_cdf -o sampler.cdf_bins=64 \
  -o sampler.samples_per_ray=24 -o render.compact_fraction=0.95 \
  --out runs/hard_r3_hashgrid_dcdf
run hashgrid_best 1500 $T -m tnerf.cli train --config configs/procedural_hard_hashgrid.json \
  -o field_.hash_nearest_levels=6 -o sampler.placement=occupancy_cdf \
  -o sampler.cdf_bins=64 -o sampler.samples_per_ray=24 \
  -o render.compact_fraction=0.95 --out runs/hard_r3_hashgrid_best

echo "queue drained ($(date -u +%H:%M:%S))" >&2
