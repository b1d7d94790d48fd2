#!/bin/bash
# Round-5 TPU queue, part 5 — chained after round5_queue4.sh.
#
# Single job: retry the 1024px prep rehearsal (VERDICT r4 #6). The
# queue4 attempt died at 00:36 UTC with "TPU worker process crashed or
# restarted" mid-scene-prep (the 1024^2 MHD renders); the very next DT
# client attached fine, so the crash reads transient. Attempt 1 reruns
# as-is (scene prep resumes from the cache dir); attempt 2 drops the
# prep render chunk to 2048 rays in case the fault is load-correlated.
set -u
cd /root/repo
log() { echo "[queue5 $(date -u +%H:%M:%S)] $*"; }
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

log "=== round5_queue5 start ==="
while kill -0 "$(cat /tmp/queue4_r5.pid)" 2>/dev/null; do sleep 60; done
log "--- TPU free ---"

timeout 5400 python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
    --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
    --out REHEARSAL_1024_r5.jsonl --seed 7 \
    2>/tmp/r5_rehearsal_1024b.log
commit_files "1024px prep rehearsal row with HBM stats (VERDICT r4 #6, retry)" \
    REHEARSAL_1024_r5.jsonl

if [ ! -s REHEARSAL_1024_r5.jsonl ]; then
  log "retrying with prep-batch 2048 after a lease cool-down"
  sleep 300
  timeout 5400 python scripts/psi_protocol.py --resolution 1024 --steps 3000 \
      --report-hbm --data-cache /tmp/psi_scene_cache_1024 \
      --prep-batch 2048 \
      --out REHEARSAL_1024_r5.jsonl --seed 7 \
      2>/tmp/r5_rehearsal_1024c.log
  commit_files "1024px prep rehearsal row (prep-batch 2048 retry)" \
      REHEARSAL_1024_r5.jsonl
fi

log "=== round5_queue5 done ==="

# Appended 01:27 UTC while queue5 waits on queue4: re-try the dt_long s7
# row that was killed hung at 01:16 (worker-crash casualty). Guarded so
# it never collides with the driver's end-of-round bench (~04:40 UTC).
if [ "$(date -u +%H%M)" -lt 0340 ] 2>/dev/null; then
  timeout 5400 python scripts/dt_matrix_r5.py --out DT_MATRIX_r5.jsonl \
      --seeds 7 --data-cache /tmp/dt_scene_cache_r5 \
      --only dt_long >>/tmp/r5_dt_matrix.log 2>&1
  commit_files "DT r5 matrix row: dt_long seed 7 (retry after the hung-client kill)" \
      DT_MATRIX_r5.jsonl
else
  log "skipping dt_long s7 retry: too close to the driver bench window"
fi
log "=== round5_queue5 (appended tail) done ==="
