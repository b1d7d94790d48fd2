#!/bin/bash
# Round-3 TPU queue, part 4: DT ablation rerun at the reference module's
# pixel_intensity_factor (1e17) after the liftoff diagnosis (the first two
# attempts trained at the generation pif of 1e9, where init predictions are
# ~1e-10 and gradients vanish — every config collapsed to the zero-prediction
# score). Waits for the psi_matrix occupancy rows to release the TPU.
set -u
cd /root/repo
echo "=== queue4 start $(date) ==="

if [ -f /tmp/psi_matrix_occ.pid ]; then
    pid=$(cat /tmp/psi_matrix_occ.pid)
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
    echo "--- psi_matrix done $(date) ---"
fi

timeout 7200 python scripts/dt_ablation.py \
    --out DT_ABLATION3_r3.jsonl 2>&1 | tail -25

echo "=== queue4 done $(date) ==="
