#!/bin/bash
# Round-4 follow-up TPU queue (run AFTER tools/tpu_queue_r4.sh drains):
#   1. fused_cdf   — train the new fused-kernel occupancy-CDF tier
#                    (rpc=4, S=32; the turbo quadrature with the sample
#                    budget CDF-concentrated on occupied bins) — the
#                    ">=8 fps within 0.5 dB" candidate.
#   2. fused_cdf_parity — same-checkpoint render-parity artifact.
#   3. colmap      — COLMAP -> recenter/rescale -> NDC -> train at-scale
#                    rehearsal (verdict missing #4).
#   4. pallas_remeasure — clean re-run of the pallas-hash measurement
#                    (stage 1 of the first queue hit transient remote-
#                    compile HTTP 500s on the pallas/gather entries).
#
# Usage: bash tools/tpu_queue_r4b.sh [start_stage]   (starts AT stage N)
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r4b_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r4b_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

run fused_cdf 1500 $T -m tnerf.cli train --config configs/procedural_hard_fused_cdf.json
run fused_cdf_parity 1200 $T tools/render_parity.py \
  --config configs/procedural_hard_fused_cdf.json --run runs/hard_r4_fused_cdf
# Stricter artifact: the fast CDF render vs the march renderer at the
# FLAGSHIP quality quadrature (uniform S=64) on the same checkpoint.
run fused_cdf_parity_q 1200 $T tools/render_parity.py \
  --config configs/procedural_hard_fused_cdf.json --run runs/hard_r4_fused_cdf \
  --out render_parity_vs_s64.json \
  --march-overrides sampler.placement=uniform sampler.samples_per_ray=64
# Flagship quadrature (rpc=2, S=64) with CDF placement: does
# concentration lift the 38.24 dB flagship the way it lifted hashgrid?
run fused_cdf_rpc2 1500 $T -m tnerf.cli train \
  --config configs/procedural_hard_fused.json \
  -o sampler.placement=occupancy_cdf -o sampler.cdf_bins=64 \
  --out runs/hard_r4_fused_cdf2

run colmap 1800 $T tools/colmap_rehearsal.py
run pallas_remeasure 1800 $T tools/measure_pallas_hash.py

echo "r4b queue drained ($(date -u +%H:%M:%S))" >&2
