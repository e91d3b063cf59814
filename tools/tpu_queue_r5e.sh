#!/bin/bash
# Round-5 TPU queue, fifth wave (run AFTER tools/tpu_queue_r5d.sh):
# the DIFFUSE quality gate + its exact bake.
#
# Adjudication so far (docs/ROUND5.md): the baked renderer reconstructs
# the field accurately (sigma err ~1.2 on mean 15, rgb err 0.013 at
# occupied points; renderer-level parity 42 dB on radial rays) but the
# LEARNED hashgrid colors are view-dependent (nothing regularizes them
# toward Lambertian even though the GT is), and a diffuse bake cannot
# represent that: off-radial rays measure ~31 dB, matching the TPU
# artifact (33.15 baked vs 40.99 march).  The fix that makes the bake
# EXACT in view: train the quality gate with a constant view basis
# (field_.view_encoding=sh, sh_degree=1) — the right prior for
# Lambertian scenes, and the baked render then differs from the direct
# render only by grid quantization.
#   1. hashgrid_diffuse — the 42.65 dB champion's config with the
#                         diffuse view branch (floor inherited).
#   2. bake_diffuse     — 320^3 bake + parity artifact.
#
# Usage: bash tools/tpu_queue_r5e.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5e_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r5e_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

run hashgrid_diffuse 2400 $T -m tnerf.cli train \
  --config runs/hard_r3_hashgrid_cdf/config.json \
  -o field_.view_encoding=sh -o field_.sh_degree=1 \
  -o logging.out_dir=runs/hard_r5_hashgrid_diffuse

run bake_diffuse 2400 $T -m tnerf.cli bake \
  --config runs/hard_r5_hashgrid_diffuse/config.json \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 320 --eval

echo "r5e queue drained ($(date -u +%H:%M:%S))" >&2
