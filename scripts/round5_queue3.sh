#!/bin/bash
# Round-5 TPU queue, part 3 — post-reboot rebuild of queues 1+2.
#
# The 2026-08-20 ~20:49 UTC reboot killed the in-flight queue1 chain and
# wiped /tmp + /root/.jax_cache before ANY of its output files landed
# (PSI_ARCH_r5 / DT_MATRIX_r5 / THOMSON_r5 / BUNDLE_SCORES_r5 /
# REHEARSAL_1024_r5 all absent from the tree). This rebuild applies the
# round-4 lesson properly: every result row is git-committed the moment
# it lands, so a third machine event loses at most one running step.
#
# Order = VERDICT r4 priority: #2a salvaged-bundle score, #2b probe-gate
# repair on the KNOWN failing 512px config, #3 arch 3-seed matrix
# (largest un-cashed speed lever), #4 DT production matrix, #6 1024px
# rehearsal, #8 Thomson row, then the bench pre-cache (always runs, even
# past the science deadline, so the driver's end-of-round bench is warm).
set -u
cd /root/repo
START=$(date +%s)
SCIENCE_DEADLINE=$((START + 20400))   # ~5.7h of science, then bench only

log() { echo "[queue3 $(date -u +%H:%M:%S)] $*"; }
past_deadline() { [ "$(date +%s)" -gt "$SCIENCE_DEADLINE" ]; }
commit_files() {  # commit_files "message" file...
    local msg="$1"; shift
    for _ in 1 2 3 4 5; do
        git add "$@" >/dev/null 2>&1
        if git diff --cached --quiet; then log "nothing to commit: $msg"; return 0; fi
        if git commit -m "$msg" >/dev/null 2>&1; then log "committed: $msg"; return 0; fi
        sleep 7
    done
    log "COMMIT FAILED: $msg"
}

log "=== round5_queue3 start ==="

# 0. sanity probe: absorb any stale single-tenant lease left by the reboot
timeout 900 python -c "import jax; print(jax.devices())" \
    && log "TPU probe ok" || log "TPU probe FAILED (continuing; runs will retry)"

# 1. VERDICT #2a — score the salvaged s8 probe-rerun keep_best bundle
timeout 2700 python scripts/score_bundle.py \
    --bundle artifacts_r4/s8_probe_rerun_best.npz \
    --resolution 256 --data-cache /tmp/psi_scene_cache_256 \
    --label s8_probe_rerun_keepbest_150k_20+40_256px \
    --out BUNDLE_SCORES_r5.jsonl 2>/tmp/r5_score_bundle.log
commit_files "Score the salvaged s8 probe-rerun keep_best bundle (VERDICT r4 #2a)" \
    BUNDLE_SCORES_r5.jsonl

# 2. VERDICT #2b — probe-gate repair experiment on the KNOWN 512px
#    over-training failure (s7 24+48 @179k = test 25.38 vs parity 29.48;
#    the failing trace dips to 30.93, so gate at warn 34 dB).
#    Rescue = gated keep_best returns test >= 29.48; else the probe is
#    demoted with a documented negative.
if ! past_deadline; then
  timeout 10800 python scripts/psi_protocol.py --resolution 512 --keep-best \
      --data-cache /tmp/psi_scene_cache_512 --out SCALE_PROOF_r4.jsonl \
      --seed 7 --steps 179000 \
      --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
      --drift-probe-gate --drift-probe-warn-db 34 \
      2>/tmp/r5_gate_repair.log
  commit_files "Probe-gate repair row: s7 24+48 @512px @179k with drift_probe_gate warn=34 (VERDICT r4 #2b)" \
      SCALE_PROOF_r4.jsonl
fi

# 3. VERDICT #3 — arch 3-seed matrix with keep_best, plus the reigning
#    prop_24_48 config under the SAME selection protocol as control.
#    Seed-major so one full-config picture lands first; per-row commits.
for seed in 7 8 9; do
  for cfg in arch_6x384 arch_4x256 arch_6x384_half prop_24_48; do
    past_deadline && break 2
    timeout 5400 python scripts/psi_matrix.py --out PSI_ARCH_r5.jsonl \
        --seeds "$seed" --keep-best --data-cache /tmp/psi_scene_cache_128 \
        --only "$cfg" >>/tmp/r5_arch_matrix.log 2>&1
    commit_files "Arch matrix row: $cfg seed $seed (PSI_ARCH_r5, keep_best protocol)" \
        PSI_ARCH_r5.jsonl
  done
done

# 4. VERDICT #4 — DT production matrix: 256px, 5 channels, hot blob,
#    union-mask exercise, equal-steps parity control, long probe-trace row.
for seed in 7 8; do
  for arm in dt_parity dt_parity_eq dt_prop_24_48 dt_tiered_warm dt_long; do
    past_deadline && break 2
    timeout 9000 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
        --seeds "$seed" --data-cache /tmp/dt_scene_cache_r5 \
        --only "$arm" >>/tmp/r5_dt_matrix.log 2>&1
    commit_files "DT r5 matrix row: $arm seed $seed (256px 5-channel protocol)" \
        DT_MATRIX_r5.jsonl
  done
done

# 5. VERDICT #6 — 1024px prep->short-train rehearsal with HBM stats
if ! past_deadline; then
  timeout 5400 python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
      --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
      --out REHEARSAL_1024_r5.jsonl --seed 7 \
      2>/tmp/r5_rehearsal_1024.log
  commit_files "1024px prep rehearsal row with HBM stats (VERDICT r4 #6)" \
      REHEARSAL_1024_r5.jsonl
fi

# 6. VERDICT #8 — Thomson accuracy + throughput row on the real chip
if ! past_deadline; then
  timeout 3600 python scripts/thomson_protocol.py --out THOMSON_r5.json \
      2>/tmp/r5_thomson.log
  commit_files "Thomson head accuracy+throughput row on TPU (VERDICT r4 #8)" \
      THOMSON_r5.json
fi

# 7. stretch — production-resolution validation of the arch axis:
#    6x384 + 24+48 at 512px equal-steps vs the committed parity control
if ! past_deadline; then
  timeout 7200 python scripts/psi_protocol.py --resolution 512 --keep-best \
      --data-cache /tmp/psi_scene_cache_512 --out PSI_ARCH_r5.jsonl \
      --seed 7 --steps 55000 \
      --proposal-coarse --n-stratified 24 --n-hierarchical 48 \
      --model-layers 6 --model-filter 384 \
      2>/tmp/r5_arch512.log
  commit_files "Arch 6x384 + 24+48 @512px equal-steps row (production-resolution arch validation)" \
      PSI_ARCH_r5.jsonl
fi

# 8. ALWAYS: bench pre-cache so the driver's end-of-round bench run hits
#    a warm compile cache (the reboot wiped /root/.jax_cache)
timeout 3600 python bench.py > /tmp/r5_bench_precache.json 2>/tmp/r5_bench.log \
    && log "bench pre-cache: $(cat /tmp/r5_bench_precache.json)"

log "=== round5_queue3 done ==="
