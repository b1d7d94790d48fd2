#!/bin/bash
# Round-3 TPU queue, part 12 (chained after queue11 by the launcher —
# single-tenant TPU, never overlap TPU processes):
#   1. plain 4x128 prop_24_48 control at the 12.5k-step schedule — the
#      same-scale attribution row for the grid-16-only TPU result
#      (PSI_GRID_r3: does the grid beat a plain MLP of its own size at
#      the real schedule, or only the 2.4k CPU mini?)
#   2. artifact-vs-live serving throughput on the real chip (ROADMAP
#      round-4 item 5), using the control row's saved bundle.
set -u
cd /root/repo
echo "=== queue12 start $(date) ==="

timeout 5400 python scripts/psi_protocol.py \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    --model-layers 4 --model-filter 128 --steps 12500 --seed 7 \
    --data-cache /tmp/psi_scene_cache \
    --workdir /tmp/psi_ctrl_4x128 \
    --out PSI_GRID_r3.jsonl 2>&1 | tail -3
echo "--- plain-4x128 control done $(date) ---"

timeout 3600 python scripts/probe_serving.py \
    --state /tmp/psi_ctrl_4x128/run/save_state.npz \
    --resolution 512 --out SERVING_TPU_r3.json 2>&1 | tail -5
echo "--- serving probe done $(date) ---"

echo "=== queue12 done $(date) ==="
