#!/bin/bash
# Round-4 TPU queue, part 11: the 24+48 budget at 512 px (seed 7). The
# 20+40 deep cut lost its 512 px pair (28.06 vs parity 29.48,
# SCALE_PROOF_r4); this runs the tightest-variance 24+48 budget at the
# same wall-clock to test whether the milder cut carries production
# resolution. Chained after round4_queue10.sh.
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_512
echo "=== round4_queue11 start $(date) ==="
while kill -0 "$(cat /tmp/queue10_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache $CACHE --out $OUT --seed 7 --steps 179000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale512_s7_2448.log \
    && echo "--- 512px 24+48 s7 done $(date) ---"

echo "=== round4_queue11 done $(date) ==="
