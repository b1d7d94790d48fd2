#!/bin/bash
# Round-3 CPU mini queue, part 5: refine the 16-only discovery
# (RESULTS.md overfit-fix matrix: dense 16^3 single level = +2.7 dB over
# plain at matched SSIM). Two directions at the same protocol/controls
# (PSI_GRID_CPU2_r3.jsonl family):
#   * 24^3 single level — more capacity, cell ~0.11 Rs (still coarser
#     than the 32^3 memorization scale?)
#   * 16^3 with 16 features — capacity via width instead of resolution
# Chained after round3_cpu_queue4.sh (single core — never overlap).
set -u
cd /root/repo
COMMON="--platform cpu --resolution 64 --steps 2400 --n-stratified 24
        --n-hierarchical 48 --proposal-coarse --model-layers 4
        --model-filter 128 --seed 7 --data-cache /tmp/psi_cpu_scene"
RECIPE="--table-lr-mult 10 --adam-eps 1e-15"
echo "=== cpu_queue5 start $(date) ==="

python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 24 \
    --out PSI_GRID_CPU2_r3.jsonl \
    && echo "--- grid-24-only done $(date) ---"

python scripts/psi_protocol.py $COMMON $RECIPE --grid-sizes 16 \
    --grid-features 16 --out PSI_GRID_CPU2_r3.jsonl \
    && echo "--- grid-16-f16 done $(date) ---"

echo "=== cpu_queue5 done $(date) ==="
