#!/bin/bash
# Round-4 TPU queue, part 8: the seed-8 scale-proof reversal follow-up.
# SCALE_PROOF_r4 s8 pair REVERSED (fast 20+40 test 25.47 vs parity
# 31.14) while s7 won (+2.93 dB): the deep-cut budget's long-schedule
# high-latitude overfit is seed-dependent, and the ecliptic-band val
# (keep_best's signal) cannot see it. PSI_MATRIX_r3 found 24+48 the
# tightest-variance budget (28.80 +- 0.28 across 3 seeds) — this runs
# the 24+48 production schedule on seed 8 at equal wall-clock
# (200000 * 159.5/177.9 ~ 179k steps) to test whether the budget choice
# is the fragility lever. Chained after round4_queue7.sh.
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_256
echo "=== round4_queue8 start $(date) ==="
while kill -0 "$(cat /tmp/queue7_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/psi_protocol.py --resolution 256 --keep-best \
    --data-cache $CACHE --out $OUT --seed 8 --steps 179000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale_s8_2448.log \
    && echo "--- 24+48 s8 done $(date) ---"

echo "=== round4_queue8 done $(date) ==="
