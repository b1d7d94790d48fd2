#!/bin/bash
# Round-4 TPU queue, part 14 (opportunistic, last): the seed-7 24+48
# long-schedule companion row. queue12's seed-8 24+48 row recovered the
# 20+40 reversal to within 0.95 dB of parity at 3.30x; this gives the
# RECOMMENDED production budget its second long-schedule seed so the
# guidance row reads as a pair, not a point. Chained after
# round4_queue13.sh (single-tenant TPU). If the session ends first, the
# run dies harmlessly (row appends only on completion).
set -u
cd /root/repo
echo "=== round4_queue14 start $(date) ==="
while kill -0 "$(cat /tmp/queue13_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 256 --keep-best \
    --data-cache /tmp/psi_scene_cache_256 --out SCALE_PROOF_r4.jsonl \
    --seed 7 --steps 179000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale_s7_2448.log \
    && echo "--- 24+48 s7 @256 done $(date) ---"

echo "=== round4_queue14 done $(date) ==="
