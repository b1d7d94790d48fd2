#!/bin/bash
# Round-4 TPU queue, part 3 (VERDICT r3 #3, TPU half): the dense-cadence
# FAST-evolution temporal closed loop — the value case the capacity sweep
# (TEMPORAL_CAPACITY_*_r3) predicts for temporal (HexPlane) tables: >= 8
# frames of fast evolution. 12 frames, drift 2.0 rad (4x the slow CPU
# scene), equal budget/steps across arms; plain (pure 4D MLP) vs static
# VM vs vm_time-8. Then a seed-8 replica of the SCALE PROOF pair so the
# 200k-step production-schedule claim rests on 2 seeds.
# Chained after round4_queue2.sh (single-tenant TPU).
set -u
cd /root/repo
echo "=== round4_queue3 start $(date) ==="
while kill -0 "$(cat /tmp/queue2_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

TCOMMON="--frames 12 --views 6 --steps 4000 --resolution 128 --drift 2.0
         --n-stratified 24 --n-hierarchical 48"

python scripts/temporal_closed_loop.py $TCOMMON \
    > TEMPORAL_TPU_r4_plain.json 2>/tmp/ttpu_plain.log \
    && echo "--- plain arm done $(date) ---" \
    && tail -1 TEMPORAL_TPU_r4_plain.json

python scripts/temporal_closed_loop.py $TCOMMON \
    --grid-size 32 --grid-rank 16 --grid-time 0 \
    > TEMPORAL_TPU_r4_vmstatic.json 2>/tmp/ttpu_vmstatic.log \
    && echo "--- vm-static arm done $(date) ---" \
    && tail -1 TEMPORAL_TPU_r4_vmstatic.json

python scripts/temporal_closed_loop.py $TCOMMON \
    --grid-size 32 --grid-rank 16 --grid-time 8 \
    > TEMPORAL_TPU_r4_vmtime.json 2>/tmp/ttpu_vmtime.log \
    && echo "--- vm_time arm done $(date) ---" \
    && tail -1 TEMPORAL_TPU_r4_vmtime.json

# scale-proof seed 8 (queue1 recipe, second seed)
OUT=SCALE_PROOF_r4.jsonl
CACHE=/tmp/psi_scene_cache_256
SCOMMON="--resolution 256 --keep-best --data-cache $CACHE --out $OUT"

python scripts/psi_protocol.py $SCOMMON --seed 8 --steps 200000 \
    --proposal-coarse --n-stratified 20 --n-hierarchical 40 \
    2>/tmp/scale_fast_s8.log \
    && echo "--- fast s8 done $(date) ---"

python scripts/psi_protocol.py $SCOMMON --seed 8 --steps 55000 \
    2>/tmp/scale_parity_s8.log \
    && echo "--- parity s8 done $(date) ---"

echo "=== round4_queue3 done $(date) ==="
