#!/bin/bash
# Round-4 TPU queue, part 6: the TIERED fused serving artifact (VERDICT
# r3 #5's "optionally tiered" deployment default). Off-disk pixels
# dominate full-disk frames, so baking the adaptive per-ray budget into
# the artifact should cut serve cost; this measures the latency AND the
# quality cost through the same harness as the full-budget rows.
# Chained after round4_queue5.sh (single-tenant TPU).
set -u
cd /root/repo
BUNDLE=/tmp/psi_protocol_j6qsck8b/run/save_state_best.npz
ART=/tmp/flagship_r4_tiered.shlo
GT='/tmp/psi_scene_cache_256/gt/*.fits'

echo "=== round4_queue6 start $(date) ==="
while kill -0 "$(cat /tmp/queue5_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/probe_serving.py --state "$BUNDLE" --resolution 512 \
    --batch-size 8192 --tier 0.5,16 --out /tmp/serving_tiered_latency.json \
    2>/tmp/serving_tiered_latency.log \
    && echo "--- tiered latency probe done $(date) ---"

python - <<'EOF' 2>/tmp/serving_tiered_export.log
from sunerf_tpu.evaluation.serving import export_serving
meta = export_serving('/tmp/psi_protocol_j6qsck8b/run/save_state_best.npz',
                      '/tmp/flagship_r4_tiered.shlo', batch_size=8192,
                      tier=(0.5, 16))
print('exported, fused_tpu =', meta['fused_tpu'], 'tier =', meta['tier'])
EOF

python -m sunerf_tpu.evaluation.metrics_harness --state "$ART" \
    --data "$GT" \
    --output /tmp/serving_tiered_quality.json \
    2>/tmp/serving_tiered_quality.log \
    && echo "--- tiered artifact scored $(date) ---"

python - <<'EOF'
import json
out = {'flagship_bundle': 'psi_protocol_j6qsck8b/save_state_best.npz '
                          '(SCALE_PROOF_r4 200k-step winner, prop+20+40)',
       'artifact': 'flagship_r4_tiered.shlo (fused tpu module, tier 0.5,16, '
                   'batch 8192)',
       'full_budget_rows': 'SERVING_FUSED_r4.json / SERVING_r4.json'}
for key, path in [('latency', '/tmp/serving_tiered_latency.json'),
                  ('quality', '/tmp/serving_tiered_quality.json')]:
    try:
        with open(path) as f:
            out[key] = json.load(f)
    except Exception as e:
        out[key] = f'MISSING: {e}'
with open('SERVING_TIERED_r4.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote SERVING_TIERED_r4.json')
EOF
echo "=== round4_queue6 done $(date) ==="
