#!/bin/bash
# Round-5 TPU queue, part 4 — resume of queue3 after the 23:47 session
# kill took its chain down mid-dt_prop_24_48-s7.
#
# Remaining work, re-prioritised so the cheap zero-evidence VERDICT items
# (#8 Thomson, #6 1024px rehearsal) land before the long DT tail — a
# machine event mid-queue then costs one row, not a whole VERDICT item.
#
#   1. DT s7 remaining fast arms (prop_24_48, tiered_warm)
#   2. Thomson accuracy+throughput row (VERDICT #8 — no evidence yet)
#   3. 1024px prep rehearsal with HBM stats (VERDICT #6 — no evidence yet)
#   4. DT s7 long-schedule probe-trace row (dt_long)
#   5. DT s8: parity, parity_eq, prop_24_48, tiered_warm
#   6. Arch 6x384+24+48 @512px equal-steps (production-res arch check)
#   7. DT s8 dt_long (stretch)
#   8. ALWAYS: bench pre-cache (reboot wiped /root/.jax_cache earlier;
#      queue3 never reached its bench step)
set -u
cd /root/repo
START=$(date +%s)
SCIENCE_DEADLINE=$((START + 12600))   # ~3.5h science, then bench only

log() { echo "[queue4 $(date -u +%H:%M:%S)] $*"; }
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

log "=== round5_queue4 start ==="

# 0. absorb the stale single-tenant lease left by the killed dt row
timeout 900 python -c "import jax; print(jax.devices())" \
    && log "TPU probe ok" || log "TPU probe FAILED (continuing; runs will retry)"

# 1. DT s7 fast arms (finish the seed-7 picture queue3 was mid-way through)
for arm in dt_prop_24_48 dt_tiered_warm; do
  past_deadline && break
  timeout 9000 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 7 --data-cache /tmp/dt_scene_cache_r5 \
      --only "$arm" >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: $arm seed 7 (256px 5-channel protocol)" \
      DT_MATRIX_r5.jsonl
done

# 2. VERDICT #8 — Thomson accuracy + throughput row on the real chip
if ! past_deadline; then
  timeout 3600 python scripts/thomson_protocol.py --out THOMSON_r5.json \
      2>/tmp/r5_thomson.log
  commit_files "Thomson head accuracy+throughput row on TPU (VERDICT r4 #8)" \
      THOMSON_r5.json
fi

# 3. VERDICT #6 — 1024px prep->short-train rehearsal with HBM stats
if ! past_deadline; then
  timeout 5400 python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
      --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
      --out REHEARSAL_1024_r5.jsonl --seed 7 \
      2>/tmp/r5_rehearsal_1024.log
  commit_files "1024px prep rehearsal row with HBM stats (VERDICT r4 #6)" \
      REHEARSAL_1024_r5.jsonl
fi

# 4. DT s7 long-schedule probe-trace row (the row VERDICT #4 names)
if ! past_deadline; then
  timeout 9000 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 7 --data-cache /tmp/dt_scene_cache_r5 \
      --only dt_long >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: dt_long seed 7 (long-schedule probe-trace row)" \
      DT_MATRIX_r5.jsonl
fi

# 5. DT s8 arms (second seed for the matrix)
for arm in dt_parity dt_parity_eq dt_prop_24_48 dt_tiered_warm; do
  past_deadline && break
  timeout 9000 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 8 --data-cache /tmp/dt_scene_cache_r5 \
      --only "$arm" >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: $arm seed 8 (256px 5-channel protocol)" \
      DT_MATRIX_r5.jsonl
done

# 6. production-resolution validation of the arch axis: 6x384 + 24+48 at
#    512px equal-steps vs the committed parity control (29.48 s7)
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

# 7. stretch — DT long row, second seed
if ! past_deadline; then
  timeout 9000 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 8 --data-cache /tmp/dt_scene_cache_r5 \
      --only dt_long >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: dt_long seed 8 (256px 5-channel protocol)" \
      DT_MATRIX_r5.jsonl
fi

# 8. ALWAYS: bench pre-cache so the driver's end-of-round bench is warm
timeout 3600 python bench.py > /tmp/r5_bench_precache.json 2>/tmp/r5_bench.log \
    && log "bench pre-cache: $(cat /tmp/r5_bench_precache.json)"

log "=== round5_queue4 done ==="
