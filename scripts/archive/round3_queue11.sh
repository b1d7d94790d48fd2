#!/bin/bash
# Round-3 TPU queue, part 11: queue10's rows REORDERED for a short
# session window — the decisive 16-only grid arbitration row first
# (CPU evidence: +2.7 dB test PSNR at matched SSIM, RESULTS.md
# overfit-fix matrix), then VM-32-r16, then grid-coarse, then the EMA
# pair. Single-tenant TPU: never overlap TPU processes.
set -u
cd /root/repo
echo "=== queue11 start $(date) ==="

BASE="--proposal-coarse --n-stratified 24 --n-hierarchical 48
      --model-layers 4 --model-filter 128 --steps 12500 --seed 7
      --data-cache /tmp/psi_scene_cache"
RECIPE="--table-lr-mult 10 --adam-eps 1e-15"

timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 16 --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- grid-16-only row done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 32 --grid-rank 16 --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- vm-32-r16 row done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 16 32 --grid-coarse --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- grid-coarse row done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE --keep-best \
    --out PSI_EMA_r3.jsonl 2>&1 | tail -4
echo "--- keep-best control done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE --keep-best \
    --ema-decay 0.999 --out PSI_EMA_r3.jsonl 2>&1 | tail -4
echo "--- keep-best+ema row done $(date) ---"

echo "=== queue11 done $(date) ==="
