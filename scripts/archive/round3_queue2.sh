#!/bin/bash
# Round-3 queue part 2: re-runs of the two fixed ablations.
set -u
cd "$(dirname "$0")/.."
QUEUE1_PID=${1:-}
if [ -n "$QUEUE1_PID" ]; then
  while kill -0 "$QUEUE1_PID" 2>/dev/null; do sleep 30; done
fi
python scripts/occupancy_value_case.py --out OCC_VALUE_r3.jsonl
python scripts/dt_ablation.py --out DT_ABLATION_r3.jsonl
echo "round3 queue2 done"
