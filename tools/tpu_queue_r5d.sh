#!/bin/bash
# Round-5 TPU queue, fourth wave (run AFTER tools/tpu_queue_r5c.sh):
# log1p-sigma re-bakes.  The first hashgrid bake (linear sigma, 256^3)
# measured parity 7.83 dB: the LEARNED field's sigma spikes (1e2-1e4 at
# surfaces) smear under linear interpolation — the hard analytic field
# ablation measured log1p interpolation worth +8.5 dB of bake fidelity
# (docs/ROUND5.md).  bake_field/make_baked_renderer now default to
# sigma_space=log1p; the hashgrid re-bake also goes to 320^3 (brick
# table 2.1 GB bf16) since the hard scene's rods are ~2 cells at 256^3.
#
# Usage: bash tools/tpu_queue_r5d.sh [start_stage]
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5d_status.jsonl
START=${1:-1}
i=0

run() {
  name=$1; tmo=$2; shift 2
  i=$((i + 1))
  if [ "$i" -lt "$START" ]; then return 0; fi
  echo "=== stage $i: $name ($(date -u +%H:%M:%S)) ===" >&2
  t0=$(date +%s)
  timeout "$tmo" "$@" > "runs/queue_r5d_${name}.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "{\"stage\": $i, \"name\": \"$name\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
  echo "=== stage $i: $name rc=$rc ($((t1 - t0))s) ===" >&2
}

T=python

run bake_hashgrid_log 2400 $T -m tnerf.cli bake \
  --config runs/hard_r3_hashgrid_cdf/config.json \
  -o logging.out_dir=runs/hard_r3_hashgrid_cdf \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 320 --eval

run bake_triplane_log 2400 $T -m tnerf.cli bake \
  --config runs/hard_r3_triplane_prog/config.json \
  -o logging.out_dir=runs/hard_r3_triplane_prog \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 256 --eval

run bake_cp_log 2400 $T -m tnerf.cli bake \
  --config runs/hard_r4_cp/config.json \
  -o logging.out_dir=runs/hard_r4_cp \
  -o sampler.occupancy_mask_res=32 -o render.compact=false \
  --bake-res 256 --eval

# baked fps row re-run (r5c attempt OOMed packing the 320^3 brick
# table in f32; brick_pack now runs in bf16)
run baked_bench 2400 $T -c "import bench, json; print('BAKED_BENCH ' + json.dumps(bench.bench_baked_render()))"

echo "r5d queue drained ($(date -u +%H:%M:%S))" >&2
