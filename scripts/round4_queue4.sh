#!/bin/bash
# Round-4 TPU queue, part 4: validate the fused-kernel serving artifact
# on the chip (the SERVING_r4 2.13x latency-gap fix — export_serving now
# embeds a tpu-only fused-Pallas render module next to the portable XLA
# one, and ServingModel executes it when on a TPU).
#   1. latency A/B: fused artifact vs live (expect ~1.0x) and, for the
#      record, the no-fused artifact (expect the old ~2.1x).
#   2. quality: the fused artifact scored through the SAME metrics
#      harness as SERVING_r4 — the fused module's numerics on real TPU.
# Chained after round4_queue3.sh (single-tenant TPU).
set -u
cd /root/repo
BUNDLE=/tmp/psi_protocol_j6qsck8b/run/save_state_best.npz
ART=/tmp/flagship_r4_fused.shlo
GT='/tmp/psi_scene_cache_256/gt/*.fits'

echo "=== round4_queue4 start $(date) ==="
while kill -0 "$(cat /tmp/queue3_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python scripts/probe_serving.py --state "$BUNDLE" --resolution 512 \
    --batch-size 8192 --out /tmp/serving_fused_latency.json \
    2>/tmp/serving_fused_latency.log \
    && echo "--- fused latency probe done $(date) ---"

python - <<'EOF' 2>/tmp/serving_fused_export.log
from sunerf_tpu.evaluation.serving import export_serving
meta = export_serving('/tmp/psi_protocol_j6qsck8b/run/save_state_best.npz',
                      '/tmp/flagship_r4_fused.shlo', batch_size=8192)
print('exported, fused_tpu =', meta['fused_tpu'])
EOF

python -m sunerf_tpu.evaluation.metrics_harness --state "$ART" \
    --data "$GT" \
    --output /tmp/serving_fused_quality.json 2>/tmp/serving_fused_quality.log \
    && echo "--- fused artifact scored $(date) ---"

python - <<'EOF'
import json
out = {'flagship_bundle': 'psi_protocol_j6qsck8b/save_state_best.npz '
                          '(SCALE_PROOF_r4 200k-step winner, prop+20+40)',
       'artifact': 'flagship_r4_fused.shlo (portable XLA module + tpu-only '
                   'fused-Pallas module, batch 8192)',
       'xla_path_baseline': 'SERVING_r4.json (served_over_live 2.128)'}
for key, path in [('latency', '/tmp/serving_fused_latency.json'),
                  ('quality', '/tmp/serving_fused_quality.json')]:
    try:
        with open(path) as f:
            out[key] = json.load(f)
    except Exception as e:
        out[key] = f'MISSING: {e}'
with open('SERVING_FUSED_r4.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote SERVING_FUSED_r4.json')
EOF
echo "=== round4_queue4 done $(date) ==="
