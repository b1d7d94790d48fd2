#!/bin/bash
# Round-3 TPU experiment queue: waits for the running PSI matrix driver to
# exit, then runs (in order) the contingency matrix rows, the DT ablation,
# the occupancy value case, the SimpleStar tier matrix, and the offline
# real-data rehearsal. All idempotent / append-only outputs.
set -u
cd "$(dirname "$0")/.."
MATRIX_PID=${1:-}
if [ -n "$MATRIX_PID" ]; then
  while kill -0 "$MATRIX_PID" 2>/dev/null; do sleep 30; done
fi
# contingency rows (driver skips rows already in the jsonl)
python scripts/psi_matrix.py --out PSI_MATRIX_r3.jsonl
python scripts/dt_ablation.py --out DT_ABLATION_r3.jsonl
python scripts/occupancy_value_case.py --out OCC_VALUE_r3.jsonl
python scripts/occupancy_ablation.py --tiers --steps 3000 \
    > SIMPLESTAR_TIERS_r3.log 2>&1
python scripts/real_data_rehearsal.py --out REHEARSAL_r3.json
echo "round3 queue done"
