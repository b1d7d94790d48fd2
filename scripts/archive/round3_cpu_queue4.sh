#!/bin/bash
# Round-3 CPU mini queue, part 4: temporal-grid (grid_time / HexPlane)
# ATTRIBUTION on the temporal closed loop. This scene evolves SLOWLY
# (0.5 rad drift) — the capacity sweep (RESULTS.md) predicts static VM
# wins here and vm_time is neutral-to-negative; the run tests that
# prediction in the render protocol (the fast-drift dense-cadence case
# where vm_time wins is the round-4 TPU item). Frames 6 (not 4): the
# sweep showed 4-frame cadence makes vm_time silently overfit.
# Chained after round3_cpu_queue3.sh (single core — never overlap).
set -u
cd /root/repo
COMMON="--platform cpu --frames 6 --views 6 --steps 1200 --resolution 48
        --n-stratified 24 --n-hierarchical 48"
echo "=== cpu_queue4 start $(date) ==="

python scripts/temporal_closed_loop.py $COMMON \
    > TEMPORAL_GRID_CPU_r3_plain.json 2>/tmp/tcl_plain.log \
    && echo "--- plain control done $(date) ---" \
    && tail -1 TEMPORAL_GRID_CPU_r3_plain.json

python scripts/temporal_closed_loop.py $COMMON \
    --grid-size 32 --grid-rank 16 --grid-time 8 \
    > TEMPORAL_GRID_CPU_r3_grid.json 2>/tmp/tcl_grid.log \
    && echo "--- grid_time row done $(date) ---" \
    && tail -1 TEMPORAL_GRID_CPU_r3_grid.json

# Attribution row: STATIC VM (grid_time 0) — the regression probe
# (TEMPORAL_CAPACITY_r3.json) says the static tables carry the win at
# slow drift; this separates "VM capacity" from "temporal tables".
python scripts/temporal_closed_loop.py $COMMON \
    --grid-size 32 --grid-rank 16 --grid-time 0 \
    > TEMPORAL_GRID_CPU_r3_vmstatic.json 2>/tmp/tcl_vmstatic.log \
    && echo "--- vm-static row done $(date) ---" \
    && tail -1 TEMPORAL_GRID_CPU_r3_vmstatic.json

echo "=== cpu_queue4 done $(date) ==="
