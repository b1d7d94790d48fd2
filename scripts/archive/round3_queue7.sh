#!/bin/bash
# Round-3 TPU queue, part 7: feature-grid encoding on the real chip.
# Run AFTER queue6 (single-tenant TPU — never overlap TPU processes).
#   1. single-seed psi_193 rows FIRST (quality gates the round-4 grid
#      decision; speed probes only matter if quality holds): equal-steps
#      plain 4x128 control + grid rows at the prop_24_48 budget family
#   2. kernel-level timing probes (PROBE_GRID_r3.json, tap cost, hat-build
#      three-way, full-step hat A/B)
set -u
cd /root/repo
echo "=== queue7 start $(date) ==="

for i in $(seq 1 200); do
    if timeout 600 python -c \
        "import jax, jax.numpy as jnp; float(jnp.ones((8,8)).sum())" \
        >/dev/null 2>&1; then
        echo "--- tunnel up $(date) ---"; break
    fi
    echo "probe $i failed $(date)"; sleep 180
done

# plain 4x128 control at the same steps: the CPU mini A/B
# (PSI_GRID_CPU_r3.jsonl) showed grids UNDERFITTING at short schedules, so
# the grid rows need an equal-steps plain control to be interpretable
timeout 5400 python scripts/psi_protocol.py \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    --model-layers 4 --model-filter 128 --steps 12500 --seed 7 \
    --out PSI_GRID_r3.jsonl --data-cache /tmp/psi_scene_cache \
    2>&1 | tail -4
echo "--- plain 4x128 control done $(date) ---"

for arch in "4 128" "2 128"; do
    set -- $arch
    timeout 5400 python scripts/psi_protocol.py \
        --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
        --model-layers "$1" --model-filter "$2" \
        --grid-sizes 16 32 --table-lr-mult 10 --adam-eps 1e-15 \
        --steps 12500 --seed 7 \
        --out PSI_GRID_r3.jsonl --data-cache /tmp/psi_scene_cache \
        2>&1 | tail -4
    echo "--- grid ${1}x${2} row done $(date) ---"
done

# TV-regularized grid row: the CPU A/B measured a 5.3 dB train-test gap on
# the grid config (table overfits the 14 training views); TV on the tables
# is the standard few-view fix (objective.py table_tv). Weight 1e-3 is the
# CPU-evidenced point (PSI_GRID_CPU2_r3.jsonl: recovers + beats the plain
# control's test PSNR).
timeout 5400 python scripts/psi_protocol.py \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    --model-layers 4 --model-filter 128 \
    --grid-sizes 16 32 --table-lr-mult 10 --adam-eps 1e-15 \
    --table-tv 1e-3 --steps 12500 --seed 7 \
    --out PSI_GRID_r3.jsonl --data-cache /tmp/psi_scene_cache \
    2>&1 | tail -4
echo "--- grid TV row done $(date) ---"

timeout 3600 python scripts/probe_grid_kernel.py --out PROBE_GRID_r3.json \
    2>&1 | tail -10
echo "--- grid kernel probe done $(date) ---"

timeout 3600 python scripts/probe_grid_hatbuild.py 2>&1 | tail -2 \
    | tee PROBE_GRID_HATBUILD_r3.txt
echo "--- hat-build probe done $(date) ---"

timeout 3600 python scripts/probe_grid_step.py --out PROBE_GRID_STEP_r3.json \
    2>&1 | tail -2
echo "--- grid step A/B done $(date) ---"

timeout 3600 python scripts/probe_grid_taps.py 2>&1 | tail -4 \
    | tee PROBE_GRID_TAPS_r3.txt
echo "--- tap-cost probe done $(date) ---"

echo "=== queue7 done $(date) ==="
