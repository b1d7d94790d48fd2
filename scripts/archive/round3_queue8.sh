#!/bin/bash
# Round-3 TPU queue, part 8: relaunch of the outage-blocked work.
# Runs queue6 (arch matrix rows, DT ablation, bench pre-cache) then
# queue7 (grid kernel/tap/hat probes + psi grid rows) sequentially —
# single-tenant TPU, never overlap TPU processes.
set -u
cd /root/repo
echo "=== queue8 start $(date) ==="
bash scripts/round3_queue6.sh
bash scripts/round3_queue7.sh
echo "=== queue8 done $(date) ==="
