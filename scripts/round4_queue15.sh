#!/bin/bash
# Round-4 TPU queue, part 15: attribute the 512 px reversal.
#
# The landed 512 px seed-7 pair (SCALE_PROOF_r4.jsonl) shows the
# PROMOTED production budget losing at production resolution:
# 24+48 @179k steps (equal wall-clock) test 25.38/0.825 vs parity
# 29.48/0.826 — a −4.10 dB reversal, train PSNR 36.26 (band
# overfitting), and the high-latitude drift probe SILENT
# (drift_since_best stays ≥30 dB: the model converged to a wrong
# high-lat solution early and stayed self-consistent, which a GT-free
# stability probe cannot see).
#
# Hypothesis (from RESULTS.md's documented long-schedule degradation):
# the equal-WALL-CLOCK protocol forces the fast arm to over-train
# (179k steps vs the 12.5k-protocol scale where 24+48 is 3-seed
# robust). If true, the fast config at the parity control's own step
# count (55k — "equal steps") should recover to ~parity quality at
# ~1/3.3 the wall-clock, reframing production guidance from
# "equal-wall-clock multiplier" to "time-to-quality multiplier".
#
# Rows, priority order (each appends only on completion; a session
# end kills the rest harmlessly):
#   1. s7 24+48 @512 px, 55k steps  (equal-steps attribution, ~20 min)
#   2. s8 parity @512 px, 55k steps (second production-resolution seed)
#   3. s8 24+48 @512 px, 55k steps  (equal-steps pair on the 2nd seed)
# Chained after round4_queue14.sh (single-tenant TPU).
set -u
cd /root/repo
echo "=== round4_queue15 start $(date) ==="
while kill -0 "$(cat /tmp/queue14_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
    --seed 7 --steps 55000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale_s7_2448_512_eqsteps.log \
    && echo "--- equal-steps 24+48 s7 @512 done $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
    --seed 8 --steps 55000 \
    2>/tmp/scale_s8_parity_512.log \
    && echo "--- parity s8 @512 done $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
    --seed 8 --steps 55000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/scale_s8_2448_512_eqsteps.log \
    && echo "--- equal-steps 24+48 s8 @512 done $(date) ---"

echo "=== round4_queue15 done $(date) ==="
