#!/bin/bash
# Round-4 TPU queue, part 1 — the SCALE PROOF (VERDICT r3 #1, the one
# claim the repo ships but never executed): run config/psi_193_fast.yaml's
# schedule AS SHIPPED (200k steps, keep_best, proposal + 20+40) at 256 px
# against an equal-wall-clock parity control.
#
# Step counts equalize wall-clock from the round-3 measured rates
# (PSI_MATRIX_r3 / BENCH_r03: fast 177.9k rays/s, parity 49.1k):
#   200000 * 49.1/177.9 = 55.2k -> parity gets 55000 steps (slightly MORE
#   than equal, so a fast win is conservative). Both rows run keep_best —
#   the shipped config's guard — so the comparison isolates the sampling
#   config, and measured rays/s land in the JSON for an audit.
#
# One TPU chip, single-tenant: nothing else may touch the TPU while this
# runs (CLAUDE.md gotcha).
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_256
COMMON="--resolution 256 --keep-best --data-cache $CACHE --out $OUT"
echo "=== round4 queue1 start $(date) ==="

python scripts/psi_protocol.py $COMMON --seed 7 --steps 200000 \
    --proposal-coarse --n-stratified 20 --n-hierarchical 40 \
    2>/tmp/scale_fast_s7.log \
    && echo "--- fast s7 done $(date) ---"

python scripts/psi_protocol.py $COMMON --seed 7 --steps 55000 \
    2>/tmp/scale_parity_s7.log \
    && echo "--- parity s7 done $(date) ---"

echo "=== round4 queue1 done $(date) ==="
