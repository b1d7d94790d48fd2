#!/bin/bash
# Round-4 TPU queue, part 5: the 512 px scale-proof replica (VERDICT r3
# weak #1 asked for 256-512 px; queue1 ran 256). Same recipe as
# round4_queue1.sh — psi_193_fast AS SHIPPED (200k steps, keep_best,
# prop + 20+40) vs the equal-wall-clock parity control (55k steps,
# slightly MORE than equal so a fast win stays conservative) — at 512 px,
# seed 7. Results append to SCALE_PROOF_r4.jsonl (rows carry resolution).
# Chained after round4_queue4.sh (single-tenant TPU).
set -u
cd /root/repo
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_512
COMMON="--resolution 512 --keep-best --data-cache $CACHE --out $OUT"

echo "=== round4_queue5 start $(date) ==="
while kill -0 "$(cat /tmp/queue4_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/psi_protocol.py $COMMON --seed 7 --steps 200000 \
    --proposal-coarse --n-stratified 20 --n-hierarchical 40 \
    2>/tmp/scale512_fast_s7.log \
    && echo "--- 512px fast s7 done $(date) ---"

python scripts/psi_protocol.py $COMMON --seed 7 --steps 55000 \
    2>/tmp/scale512_parity_s7.log \
    && echo "--- 512px parity s7 done $(date) ---"

echo "=== round4_queue5 done $(date) ==="
