#!/bin/bash
# Round-4 TPU queue, part 10: reverse budget annealing on the seed-8
# long-schedule reversal. Mechanism hypothesis (RESULTS.md round-4 scale
# section): the deep-cut budget drifts at high latitude LATE in long
# schedules, invisibly to band-val. If so, finishing the schedule at the
# FULL budget should repair it: first 85% of steps at prop+20+40, final
# 15% at prop+64+128 (psi_protocol --anneal-frac trains the FIRST
# fraction at the anneal budgets, then the main budget — so anneal=20+40,
# main=64+128 is the "repair finish"). Step count keeps total wall-clock
# at or under the parity control's (~1070 s vs 1198 s estimated from the
# measured rates). Chained after round4_queue9.sh.
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_256
echo "=== round4_queue10 start $(date) ==="
while kill -0 "$(cat /tmp/queue9_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/psi_protocol.py --resolution 256 --keep-best \
    --data-cache $CACHE --out $OUT --seed 8 --steps 145000 \
    --proposal-coarse --anneal-frac 0.85 \
    --anneal-stratified 20 --anneal-hierarchical 40 \
    --n-stratified 64 --n-hierarchical 128 \
    2>/tmp/scale_s8_revanneal.log \
    && echo "--- reverse-anneal s8 done $(date) ---"

echo "=== round4_queue10 done $(date) ==="
