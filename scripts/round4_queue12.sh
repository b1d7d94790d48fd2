#!/bin/bash
# Round-4 TPU queue, part 12 — post-reboot recovery chain. The machine
# rebooted mid-queue (2026-08-19 ~21:38): /tmp (scene caches, flagship
# bundles) and /root/.jax_cache were wiped, the repo was reset to the
# last commit, and the uncommitted 512 px scale-pair rows (fast 20+40
# 28.06 vs parity 29.48 test PSNR, observed in the queue5 logs) were
# LOST. Queues 8-11 never produced rows. This chain re-runs the
# highest-value remainder in priority order, each stage timeout-bounded
# so later stages still get chip time:
#   1. bench.py pre-cache (cold Mosaic compiles through the tunnel skew
#      the driver's end-of-round bench — round-3 lesson)
#   2. seed-8 24+48 @256 px, equal wall-clock (queue8: does the
#      tightest-variance budget fix the seed-8 long-schedule reversal?)
#   3. 512 px parity control, seed 7 (re-establish the lost control)
#   4. 512 px 24+48, seed 7 (production budget at production resolution)
#   5. bench refresh (warm; headline rate for BENCH_r04)
# One TPU chip, single-tenant: nothing else may touch the TPU while this
# runs (CLAUDE.md gotcha).
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
echo "=== round4_queue12 start $(date) ==="

timeout 3000 python bench.py > /tmp/bench_precache1.json \
    2>/tmp/bench_precache1.log \
    && echo "--- bench pre-cache done $(date) ---" \
    && cat /tmp/bench_precache1.json

timeout 3600 python scripts/psi_protocol.py --resolution 256 --keep-best \
    --data-cache /tmp/psi_scene_cache_256 --out $OUT --seed 8 \
    --steps 179000 --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale_s8_2448.log \
    && echo "--- 24+48 s8 @256 done $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out $OUT --seed 7 \
    --steps 55000 \
    2>/tmp/scale512_parity_s7.log \
    && echo "--- 512px parity s7 done $(date) ---"

timeout 3900 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out $OUT --seed 7 \
    --steps 179000 --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale512_s7_2448.log \
    && echo "--- 512px 24+48 s7 done $(date) ---"

timeout 900 python bench.py > /tmp/bench_refresh.json \
    2>/tmp/bench_refresh.log \
    && echo "--- bench refresh done $(date) ---" \
    && cat /tmp/bench_refresh.json

echo "=== round4_queue12 done $(date) ==="
