#!/bin/bash
# Round-3 CPU mini-protocol queue, part 2: grid view-overfitting fixes +
# EMA evidence (RESULTS.md grid A/B; ROADMAP fix design space). All rows:
# psi_193 mini-protocol at res 64 / 2400 steps / prop 4x128 + fine 4x128 /
# 24+48 / seed 7 on the CPU backend (--platform cpu) — comparable ONLY
# within the PSI_GRID_CPU2_r3.jsonl family (CPU numerics, tiny schedule).
# Controls already recorded there: plain test PSNR 23.49 / SSIM 0.888;
# grid 16+32 21.11/0.787; grid+tv1e-3 24.13/0.824.
set -u
cd /root/repo
COMMON="--platform cpu --resolution 64 --steps 2400 --n-stratified 24
        --n-hierarchical 48 --proposal-coarse --model-layers 4
        --model-filter 128 --seed 7 --data-cache /tmp/psi_cpu_scene"
RECIPE="--grid-features 8 --table-lr-mult 10 --adam-eps 1e-15"
echo "=== cpu_queue2 start $(date) ==="

# Fix option 3: tables on the PROPOSAL field only (fine field plain) —
# proposal overfitting cannot corrupt held-out renders by construction.
python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 16 32 \
    --grid-coarse --out PSI_GRID_CPU2_r3.jsonl \
    && echo "--- grid-coarse done $(date) ---"

# EMA pair (separate file: keep-best changes row-scoring semantics).
python scripts/psi_protocol.py $COMMON --keep-best \
    --out PSI_EMA_CPU_r3.jsonl && echo "--- keep-best control done $(date) ---"
python scripts/psi_protocol.py $COMMON --keep-best --ema-decay 0.999 \
    --out PSI_EMA_CPU_r3.jsonl && echo "--- keep-best+ema done $(date) ---"

# Fix option 2: single coarser level (16^3 only) — less table capacity to
# memorize views with.
python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 16 \
    --out PSI_GRID_CPU2_r3.jsonl && echo "--- grid-16-only done $(date) ---"

echo "=== cpu_queue2 done $(date) ==="
