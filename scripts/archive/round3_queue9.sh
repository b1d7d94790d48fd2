#!/bin/bash
# Round-3 TPU queue, part 9: patient-probe relaunch of queue8 (= queue6 +
# queue7). The 600s-probe loop may SELF-WEDGE: killing a probe that reached
# the claim phase re-wedges the single-tenant lease ~5 min (CLAUDE.md), and
# cold backend init through the tunnel can exceed 600s — so each killed
# probe can block the next. 1800s probes + 300s sleeps give a probe that
# reaches the claim phase ample time to COMPLETE; stderr is kept for
# diagnosis.
set -u
cd /root/repo
echo "=== queue9 start $(date) ==="

for i in $(seq 1 100); do
    if timeout 1800 python -c \
        "import jax, jax.numpy as jnp; float(jnp.ones((8,8)).sum()); print('TUNNEL-OK')" \
        > /tmp/probe9.out 2> /tmp/probe9.err; then
        echo "--- tunnel up $(date) ---"; break
    fi
    echo "probe $i failed $(date) :: $(tail -c 200 /tmp/probe9.err | tr '\n' ' ')"
    sleep 300
done

# queue6 body (its own probe loop exits immediately now that the tunnel
# answers), then queue7
bash scripts/round3_queue6.sh
bash scripts/round3_queue7.sh
echo "=== queue9 done $(date) ==="
