#!/bin/bash
# Round-5 TPU queue, sixth wave (after r5e): baked-render fps knob
# ladder — which sampling-machinery knob binds once the field is a
# lookup (runs/baked_fps_ladder.json).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
STATUS=runs/queue_r5f_status.jsonl
i=1
echo "=== stage 1: baked_ladder ($(date -u +%H:%M:%S)) ===" >&2
t0=$(date +%s)
timeout 2700 python tools/baked_fps_ladder.py > runs/queue_r5f_baked_ladder.log 2>&1
rc=$?
t1=$(date +%s)
echo "{\"stage\": 1, \"name\": \"baked_ladder\", \"rc\": $rc, \"seconds\": $((t1 - t0))}" >> "$STATUS"
echo "r5f queue drained ($(date -u +%H:%M:%S))" >&2
