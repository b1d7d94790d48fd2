#!/bin/bash
# Round-3 CPU mini-protocol queue, part 3: VM-factorized tables (the
# low-rank overfit fix, NeRFConfig.grid_rank). Same family/controls as
# round3_cpu_queue2.sh (PSI_GRID_CPU2_r3.jsonl).
set -u
cd /root/repo
COMMON="--platform cpu --resolution 64 --steps 2400 --n-stratified 24
        --n-hierarchical 48 --proposal-coarse --model-layers 4
        --model-filter 128 --seed 7 --data-cache /tmp/psi_cpu_scene"
RECIPE="--table-lr-mult 10 --adam-eps 1e-15"
echo "=== cpu_queue3 start $(date) ==="

# Fix option 4: TensoRF-style VM factorization, single 32-level, rank 16
# (3*16 = 48 features; params 3*(32^2+32)*16 = 51k vs dense 16+32 levels'
# 295k) — the low-rank prior replaces the dense tables' memorization
# capacity.
python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 32 \
    --grid-rank 16 --out PSI_GRID_CPU2_r3.jsonl \
    && echo "--- vm-32-r16 done $(date) ---"

# VM at the dense rows' level layout (16+32, rank 8 -> 24+24 features):
# separates "factorized" from "single level" in the comparison.
python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 16 32 \
    --grid-rank 8 --out PSI_GRID_CPU2_r3.jsonl \
    && echo "--- vm-16+32-r8 done $(date) ---"

echo "=== cpu_queue3 done $(date) ==="
