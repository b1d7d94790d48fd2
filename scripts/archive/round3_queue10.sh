#!/bin/bash
# Round-3 TPU queue, part 10: quality rows for the features landed during
# the 2026-08-18 outage session. Run AFTER queue9b (= queue6 + queue7) —
# single-tenant TPU, never overlap TPU processes.
#   1. grid-on-proposal row (--grid-coarse): tables where overfitting
#      cannot corrupt held-out renders
#   2. VM-factorized row (--grid-rank): the low-rank prior
#   3. EMA pair (keep-best control vs keep-best+ema, separate matrix file
#      since keep-best changes row-scoring semantics)
set -u
cd /root/repo
echo "=== queue10 start $(date) ==="

for i in $(seq 1 200); do
    if timeout 1800 python -c \
        "import jax, jax.numpy as jnp; float(jnp.ones((8,8)).sum())" \
        >/dev/null 2>&1; then
        echo "--- tunnel up $(date) ---"; break
    fi
    echo "probe $i failed $(date)"; sleep 300
done

BASE="--proposal-coarse --n-stratified 24 --n-hierarchical 48
      --model-layers 4 --model-filter 128 --steps 12500 --seed 7
      --data-cache /tmp/psi_scene_cache"
RECIPE="--table-lr-mult 10 --adam-eps 1e-15"

timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 16 32 --grid-coarse --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- grid-coarse row done $(date) ---"

# The CPU overfit-fix matrix's decisive winner (RESULTS.md: 16-only =
# 26.15 test PSNR vs plain 23.49 at matched SSIM): single coarser level.
timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 16 --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- grid-16-only row done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE $RECIPE \
    --grid-sizes 32 --grid-rank 16 --out PSI_GRID_r3.jsonl 2>&1 | tail -4
echo "--- vm-32-r16 row done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE --keep-best \
    --out PSI_EMA_r3.jsonl 2>&1 | tail -4
echo "--- keep-best control done $(date) ---"

timeout 5400 python scripts/psi_protocol.py $BASE --keep-best \
    --ema-decay 0.999 --out PSI_EMA_r3.jsonl 2>&1 | tail -4
echo "--- keep-best+ema row done $(date) ---"

echo "=== queue10 done $(date) ==="
