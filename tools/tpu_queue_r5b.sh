#!/bin/bash
# Round-5 TPU queue, second wave (run AFTER tools/tpu_queue_r5.sh):
#   1-3. bake_*      — bake the three quality-family gates into dense
#                      256^3 grids and write baked_parity.json (baked
#                      lookup render vs direct march render of the same
#                      checkpoint, same quadrature) — the fast-render
#                      story for the 41.5-42.65 dB families (r4 verdict
#                      missing #3).  occupancy_mask_res=32 pins both
#                      sides to the pooled fold-kernel quadrature the
#                      bench fps row uses; render.compact=false because
#                      a lookup costs less than compacting it.
#   4. loop_breakdown — attribute the real-loop vs isolated-step gap
#                      (r4 verdict missing #2).
#   5-7. suite_*     — train three white-background procedural scenes
#                      at 400^2 into the suite layout.
#   8. suite_eval    — `cli suite` batch evaluation over them (BASELINE
#                      config 4 rehearsal).
#
# Usage: bash tools/tpu_queue_r5b.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5b_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r5b_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

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

run loop_breakdown 3000 $T tools/loop_breakdown.py

SUITE_OV="-o scene.kind=procedural -o scene.scene_scale=1.0 \
  -o scene.proc_width=400 -o scene.proc_height=400 \
  -o sampler.near=2.0 -o sampler.far=5.5 \
  -o train.steps=1500 -o train.eval_every=0 -o train.checkpoint_every=1500 \
  -o train.assert_test_psnr_min=28"

run suite_prims 1800 $T -m tnerf.cli train --config configs/procedural_hard_fused.json \
  $SUITE_OV -o scene.name=prims -o scene.white_background=true \
  -o render.white_background=true --out runs/suite_rehearsal/prims

run suite_rings 1800 $T -m tnerf.cli train --config configs/procedural_hard_fused.json \
  $SUITE_OV -o scene.name=rings -o scene.white_background=true \
  -o render.white_background=true --out runs/suite_rehearsal/rings

run suite_layers 1800 $T -m tnerf.cli train --config configs/procedural_hard_fused.json \
  $SUITE_OV -o scene.name=layers -o scene.white_background=true \
  -o render.white_background=true --out runs/suite_rehearsal/layers

run suite_eval 1800 $T -m tnerf.cli suite --config configs/procedural_hard_fused.json \
  -o scene.kind=procedural -o scene.scene_scale=1.0 \
  -o scene.proc_width=400 -o scene.proc_height=400 \
  -o sampler.near=2.0 -o sampler.far=5.5 \
  -o scene.white_background=true -o render.white_background=true \
  -o logging.out_dir=runs/suite_rehearsal \
  --scenes prims,rings,layers

echo "r5b queue drained ($(date -u +%H:%M:%S))" >&2
