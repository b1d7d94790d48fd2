#!/bin/bash
# Round-3 TPU queue, part 5: the no-grid prop_24_48 control rows (3 seeds)
# for the 143k matched-quality prop_occ_24_48 result, so the win is
# attributed (grid vs plain budget cut). Waits for queue4 (DT ablation at
# pif 1e17) to release the TPU. psi_matrix is idempotent — only the new
# config runs.
set -u
cd /root/repo
echo "=== queue5 start $(date) ==="

if [ -f /tmp/round3_queue4.pid ]; then
    pid=$(cat /tmp/round3_queue4.pid)
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
    echo "--- queue4 done $(date) ---"
fi

timeout 5400 python scripts/psi_matrix.py \
    --out PSI_MATRIX_r3.jsonl 2>&1 | tail -15

echo "=== queue5 done $(date) ==="
