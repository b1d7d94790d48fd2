#!/bin/bash
# Round-5 TPU queue, part 6 — replaces queue5 (killed before it left its
# wait loop: its rehearsal steps had no end-of-round guard and could have
# held the single-tenant TPU claim into the driver's ~04:42 UTC bench).
#
# Every step here computes its timeout from a hard TPU-free deadline
# (04:25 UTC) so nothing can collide with the driver. Jobs in value
# order; each is skipped outright if less than its minimum useful budget
# remains.
#
#   1. 1024px prep rehearsal retry (VERDICT #6 — zero evidence so far;
#      prep-batch 2048 in case the 00:36 worker crash was load-correlated)
#   2. dt_long s7 retry (the row killed hung at 01:16; queue4 already
#      owns the s8 twin)
set -u
cd /root/repo
TPU_FREE_BY=$(date -u -d "today 04:25" +%s)
# if we somehow start after 04:25, the deadline is in the past and every
# budget computes <= 0 -> everything skips
now() { date +%s; }
budget() { echo $(( TPU_FREE_BY - $(now) )); }

log() { echo "[queue6 $(date -u +%H:%M:%S)] $*"; }
commit_files() {
    local msg="$1"; shift
    for _ in 1 2 3 4 5; do
        git add "$@" >/dev/null 2>&1
        if git diff --cached --quiet; then log "nothing to commit: $msg"; return 0; fi
        if git commit -m "$msg" >/dev/null 2>&1; then log "committed: $msg"; return 0; fi
        sleep 7
    done
    log "COMMIT FAILED: $msg"
}

log "=== round5_queue6 start (TPU-free deadline 04:25 UTC) ==="
while kill -0 "$(cat /tmp/queue4_r5.pid)" 2>/dev/null; do sleep 60; done
log "--- queue4 drained ---"

B=$(budget)
if [ "$B" -gt 1200 ]; then
  timeout "$B" python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
      --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
      --prep-batch 2048 \
      --out REHEARSAL_1024_r5.jsonl --seed 7 \
      2>/tmp/r5_rehearsal_1024b.log
  commit_files "1024px prep rehearsal row with HBM stats (VERDICT r4 #6, prep-batch 2048 retry)" \
      REHEARSAL_1024_r5.jsonl
else
  log "skipping 1024px rehearsal: only ${B}s left"
fi

B=$(budget)
if [ "$B" -gt 1800 ]; then
  timeout "$B" python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 7 --data-cache /tmp/dt_scene_cache_r5 \
      --only dt_long >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: dt_long seed 7 (retry after the hung-client kill)" \
      DT_MATRIX_r5.jsonl
else
  log "skipping dt_long s7 retry: only ${B}s left"
fi

log "=== round5_queue6 done ==="
