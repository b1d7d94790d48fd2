#!/bin/bash
# Round-3 TPU queue, part 3: reruns after the two fixes the first attempts
# surfaced (occupancy robust-max criterion + occ_vol factor; DT ablation
# guard-off after the spike-guard latch diagnosis). Sequential: one TPU.
set -u
cd /root/repo
echo "=== queue3 start $(date) ==="

echo "--- occupancy value case (fixed criterion + vol factor) ---"
timeout 7200 python scripts/occupancy_value_case.py \
    --out OCC_VALUE2_r3.jsonl 2>&1 | tail -20

echo "--- DT ablation rerun (guard off) ---"
timeout 7200 python scripts/dt_ablation.py \
    --out DT_ABLATION2_r3.jsonl 2>&1 | tail -20

echo "=== queue3 done $(date) ==="
