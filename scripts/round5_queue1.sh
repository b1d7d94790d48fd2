#!/bin/bash
# Round-5 TPU queue, part 1 — VERDICT r4 items, priority order.
#
#   1. Score the salvaged s8 probe-rerun best bundle (VERDICT #2a —
#      uncashed since round 4) against the resynthesized 256 px scene.
#   2. Arch 3-seed matrix with keep_best (VERDICT #3): 6x384 / 4x256 /
#      6x384_half through the 128 px psi protocol -> PSI_ARCH_r5.jsonl.
#      The largest measured un-cashed speed lever (290k rays/s benched).
#   3. Probe-gate repair experiment (VERDICT #2b): re-run the KNOWN
#      512 px over-training failure (s7 24+48 @179k steps = test 25.38 vs
#      parity 29.48) with drift_probe_gate at warn 34 dB (the recorded
#      failing trace dips to 30.93; the shipped 25 dB threshold never
#      trips). Rescue = gated keep_best returns test >= 29.48; failure =
#      documented negative -> the probe is demoted.
#   4. DT production-protocol matrix (VERDICT #4): 256 px, 5 channels,
#      hot-blob scene, union-mask exercise, equal-steps parity control,
#      long-schedule probe-trace row -> DT_MATRIX_r5.jsonl.
#   5. 1024 px prep->short-train rehearsal (VERDICT #6) with HBM stats.
#   6. Thomson accuracy + throughput row (VERDICT #8) -> THOMSON_r5.json.
#   7. bench.py pre-cache for the driver's end-of-round run.
#
# Chained after round4_queue15.sh (single-tenant TPU). Each step appends
# on completion only; a session kill loses at most the running step.
set -u
cd /root/repo
echo "=== round5_queue1 start $(date) ==="
while kill -0 "$(cat /tmp/queue15_r5.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"
# let the single-tenant claim's stale lease (from the killed queue15 row 3)
# expire before the first new client attaches
sleep 300

# 0. queue15's killed last row, re-run: s8 24+48 @512 px @55k equal-steps
#    (the killed original was crawling at 6.1k rays/s from its first step —
#    tunnel/device degradation, host feeder idle at 1.4% CPU; the identical
#    s7 program ran at 123k rays/s an hour earlier)
timeout 3600 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
    --seed 8 --steps 55000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    2>/tmp/r5_s8_2448_eqsteps_rerun.log \
    && echo "--- equal-steps 24+48 s8 @512 rerun done $(date) ---"

timeout 1800 python scripts/score_bundle.py \
    --bundle artifacts_r4/s8_probe_rerun_best.npz \
    --resolution 256 --data-cache /tmp/psi_scene_cache_256 \
    --label s8_probe_rerun_keepbest_150k_20+40_256px \
    --out BUNDLE_SCORES_r5.jsonl \
    2>/tmp/r5_score_bundle.log \
    && echo "--- salvaged-bundle score done $(date) ---"

timeout 10800 python scripts/psi_matrix.py --out PSI_ARCH_r5.jsonl \
    --seeds 7 8 9 --keep-best --data-cache /tmp/psi_scene_cache_128 \
    --only arch_6x384 arch_4x256 arch_6x384_half \
    >/tmp/r5_arch_matrix.log 2>&1 \
    && echo "--- arch matrix done $(date) ---"

timeout 7200 python scripts/psi_protocol.py --resolution 512 --keep-best \
    --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
    --seed 7 --steps 179000 \
    --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
    --drift-probe-gate --drift-probe-warn-db 34 \
    2>/tmp/r5_gate_repair.log \
    && echo "--- probe-gate repair run done $(date) ---"

timeout 14400 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
    --seeds 7 8 --data-cache /tmp/dt_scene_cache_r5 \
    >/tmp/r5_dt_matrix.log 2>&1 \
    && echo "--- DT r5 matrix done $(date) ---"

timeout 3600 python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
    --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
    --out REHEARSAL_1024_r5.jsonl --seed 7 \
    2>/tmp/r5_rehearsal_1024.log \
    && echo "--- 1024px rehearsal done $(date) ---"

timeout 2400 python scripts/thomson_protocol.py --out THOMSON_r5.json \
    2>/tmp/r5_thomson.log \
    && echo "--- thomson row done $(date) ---"

timeout 1800 python bench.py > /tmp/r5_bench_precache.json 2>/tmp/r5_bench.log \
    && echo "--- bench pre-cache done $(date) ---" \
    && cat /tmp/r5_bench_precache.json

echo "=== round5_queue1 done $(date) ==="
