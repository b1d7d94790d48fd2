#!/bin/bash
# Round-5 TPU queue, part 2 — chained after round5_queue1.sh.
#
#   1. Salvaged-bundle score RETRY (queue1's attempt crashed on the
#      renamed sidecar; artifacts_r4/s8_probe_rerun_best.json now exists
#      and the 256 px scene cache is built, so this is load + eval).
#   2. Production-resolution validation of the arch axis: 6x384 + 24+48
#      at 512 px, equal-steps (55k) vs the committed parity control
#      (29.48 s7) — whatever the 128 px matrix says, the round-4 lesson
#      is that short-protocol wins must be re-proven at 512 px.
#   3. DT r5 matrix, third seed for the four short arms (dt_long stays
#      2-seed).
set -u
cd /root/repo
echo "=== round5_queue2 start $(date) ==="
while kill -0 "$(cat /tmp/queue1_r5.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

timeout 1800 python scripts/score_bundle.py \
    --bundle artifacts_r4/s8_probe_rerun_best.npz \
    --resolution 256 --data-cache /tmp/psi_scene_cache_256 \
    --label s8_probe_rerun_keepbest_150k_20+40_256px \
    --out BUNDLE_SCORES_r5.jsonl \
    2>/tmp/r5_score_bundle2.log \
    && echo "--- salvaged-bundle score done $(date) ---"

# within-protocol control for the arch rows: the reigning quality-matched
# config (8x512 + prop_24_48) under the SAME keep_best semantics — the
# PSI_MATRIX_r3 rows are final-step-scored, so cross-file comparison
# would mix selection rules
timeout 10800 python scripts/psi_matrix.py --out PSI_ARCH_r5.jsonl \
    --seeds 7 8 9 --keep-best --data-cache /tmp/psi_scene_cache_128 \
    --only prop_24_48 \
    >/tmp/r5_arch_control.log 2>&1 \
    && echo "--- prop_24_48 keep_best control done $(date) ---"

timeout 7200 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out PSI_ARCH_r5.jsonl \
    --seed 7 --steps 55000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    --model-layers 6 --model-filter 384 \
    2>/tmp/r5_arch512.log \
    && echo "--- arch 6x384 @512px equal-steps done $(date) ---"

timeout 10800 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
    --seeds 9 --data-cache /tmp/dt_scene_cache_r5 \
    --only dt_parity dt_parity_eq dt_prop_24_48 dt_tiered_warm \
    >/tmp/r5_dt_matrix_s9.log 2>&1 \
    && echo "--- DT r5 seed-9 arms done $(date) ---"

timeout 1800 python bench.py > /tmp/r5_bench_precache2.json \
    2>/tmp/r5_bench2.log \
    && echo "--- bench re-cache done $(date) ---" \
    && cat /tmp/r5_bench_precache2.json

echo "=== round5_queue2 done $(date) ==="
