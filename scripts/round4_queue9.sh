#!/bin/bash
# Round-4 TPU queue, part 9: best-vs-final checkpoint diagnostic for the
# seed-8 scale-test reversal (RESULTS.md round-4 scale section). The s8
# fast arm's keep_best bundle scored test 25.47; this scores the FINAL
# (step-200000) bundle and re-scores best with per-view detail, to
# separate "band-val picked a high-lat pessimum" from "monotone
# high-lat drift". Chained after round4_queue8.sh.
set -u
cd /root/repo
RUN=/tmp/psi_protocol_g1mqzs06/run
GT='/tmp/psi_scene_cache_256/gt/*.fits'

echo "=== round4_queue9 start $(date) ==="
while kill -0 "$(cat /tmp/queue8_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"

python -m sunerf_tpu.evaluation.metrics_harness \
    --state "$RUN/save_state.npz" --data "$GT" --batch-size 8192 \
    --output /tmp/s8_fast_final.json 2>/tmp/s8_diag_final.log \
    && echo "--- final scored $(date) ---"

python -m sunerf_tpu.evaluation.metrics_harness \
    --state "$RUN/save_state_best.npz" --data "$GT" --batch-size 8192 \
    --output /tmp/s8_fast_best.json 2>/tmp/s8_diag_best.log \
    && echo "--- best re-scored $(date) ---"

python - <<'EOF'
import json
out = {'arm': 'SCALE_PROOF_r4 seed-8 fast (prop+20+40, 200k steps)',
       'question': 'did keep_best (band-val) pick a high-latitude '
                   'pessimum, or is the drift monotone?'}
for key, path in [('best', '/tmp/s8_fast_best.json'),
                  ('final', '/tmp/s8_fast_final.json')]:
    try:
        with open(path) as f:
            out[key] = json.load(f)
    except Exception as e:
        out[key] = f'MISSING: {e}'
with open('SCALE_S8_DIAG_r4.json', 'w') as f:
    json.dump(out, f, indent=1)
print('wrote SCALE_S8_DIAG_r4.json')
EOF
echo "=== round4_queue9 done $(date) ==="
