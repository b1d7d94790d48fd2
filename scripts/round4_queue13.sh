#!/bin/bash
# Round-4 TPU queue, part 13: validate the high-latitude drift probe
# against the REPRODUCED failure. SCALE_PROOF_r4's seed-8 fast arm
# (psi_193_fast as shipped: 200k steps, prop + 20+40, keep_best) is the
# one known long-schedule reversal (-5.67 dB on the high-lat test
# views); psi_protocol now carries the GT-free probe (train/probe.py,
# 4 views at |lat|=60°, logged per validation, trace summarized into
# the row's highlat_probe key). If the reversal reproduces AND the
# probe trace shows the failure signature (band-val near its best while
# drift_since_best collapses / warnings > 0), the probe graduates from
# observational to a checkpoint-selection signal in round 5; if the
# trace stays clean, that is the honest negative. Chained after
# round4_queue12.sh (single-tenant TPU).
set -u
cd /root/repo
echo "=== round4_queue13 start $(date) ==="
while kill -0 "$(cat /tmp/queue12_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 256 --keep-best \
    --data-cache /tmp/psi_scene_cache_256 --out SCALE_PROOF_r4.jsonl \
    --seed 8 --steps 200000 \
    --proposal-coarse --n-stratified 20 --n-hierarchical 40 \
    2>/tmp/scale_s8_probe_rerun.log \
    && echo "--- probe-instrumented s8 fast re-run done $(date) ---"

echo "=== round4_queue13 done $(date) ==="
