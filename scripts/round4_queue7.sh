#!/bin/bash
# Round-4 TPU queue, part 7 (last): bench pre-cache. Runs bench.py once
# so every bench program is in /root/.jax_cache and the driver's
# end-of-round bench run is warm (round-3 lesson: cold Mosaic compiles
# through the tunnel can take minutes and skew the captured rate).
# Chained after round4_queue6.sh (single-tenant TPU).
set -u
cd /root/repo
echo "=== round4_queue7 start $(date) ==="
while kill -0 "$(cat /tmp/queue6_r4.pid)" 2>/dev/null; do sleep 60; done
echo "--- TPU free $(date) ---"
python bench.py > /tmp/bench_precache_r4.json 2>/tmp/bench_precache_r4.log \
    && echo "--- bench pre-cache done $(date) ---" \
    && cat /tmp/bench_precache_r4.json
echo "=== round4_queue7 done $(date) ==="
