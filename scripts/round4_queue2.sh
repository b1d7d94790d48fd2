#!/bin/bash
# Round-4 TPU queue, part 2 (VERDICT r3 #5): the deployment-default
# serving artifact. The flagship scale-proof bundle (psi_193_fast's
# prop + 20+40, 200k-step keep_best winner, SCALE_PROOF_r4.jsonl) is
# exported to StableHLO and scored through the SAME metrics harness as
# its live bundle on the 256 px psi scene — artifact quality must be
# within noise of live — plus the artifact-vs-live latency probe.
# Waits for the dt_matrix warm rows first (single-tenant TPU).
set -u
cd /root/repo
BUNDLE=/tmp/psi_protocol_j6qsck8b/run/save_state_best.npz
ART=/tmp/flagship_r4.shlo
GT='/tmp/psi_scene_cache_256/gt/*.fits'

echo "=== round4_queue2 start $(date) ==="
while kill -0 "$(cat /tmp/dt_matrix.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python -m sunerf_tpu.evaluation.metrics_harness --state "$BUNDLE" \
    --data "$GT" --batch-size 8192 \
    --output /tmp/serving_r4_live.json 2>/tmp/serving_r4_live.log \
    && echo "--- live bundle scored $(date) ---"

python -m sunerf_tpu.evaluation.metrics_harness --state "$ART" \
    --data "$GT" \
    --output /tmp/serving_r4_art.json 2>/tmp/serving_r4_art.log \
    && echo "--- artifact scored $(date) ---"

python scripts/probe_serving.py --state "$BUNDLE" --resolution 512 \
    --batch-size 8192 --out /tmp/serving_r4_latency.json \
    2>/tmp/serving_r4_latency.log \
    && echo "--- latency probe done $(date) ---"

python - <<'EOF'
import json
out = {'flagship_bundle': 'psi_protocol_j6qsck8b/save_state_best.npz '
                          '(SCALE_PROOF_r4 200k-step winner, prop+20+40)',
       'artifact': 'flagship_r4.shlo (cpu+tpu lowerings, batch 8192)'}
for key, path in [('live', '/tmp/serving_r4_live.json'),
                  ('artifact', '/tmp/serving_r4_art.json'),
                  ('latency', '/tmp/serving_r4_latency.json')]:
    try:
        with open(path) as f:
            out[key] = json.load(f)
    except Exception as e:
        out[key] = f'MISSING: {e}'
with open('SERVING_r4.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote SERVING_r4.json')
EOF
echo "=== round4_queue2 done $(date) ==="
