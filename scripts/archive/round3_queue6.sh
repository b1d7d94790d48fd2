#!/bin/bash
# Round-3 TPU queue, part 6: everything blocked on the 2026-08-17 tunnel
# outage, to run unattended once the backend answers again.
#   1. wait for the TPU backend to initialize (probe loop; each probe is
#      bounded with `timeout 600` — long enough that a probe reaching the
#      claim phase COMPLETES instead of being killed mid-claim: killing a
#      claimed/queued TPU client re-wedges the single-tenant lease ~5 min
#      (CLAUDE.md), and a shorter timeout than the wedge period can
#      self-wedge the loop forever right when the tunnel returns)
#   2. architecture matrix rows (psi_matrix is idempotent: arch_6x384
#      s8/s9, arch_4x256 x3 @20k, arch_6x384_half x3 @10k)
#   3. DT ablation additions (plain 24+48 budget cut + 6x384 arch row)
#   4. bench.py (pre-caches the arch_6x384 bench key for the round-end run)
set -u
cd /root/repo
echo "=== queue6 start $(date) ==="

for i in $(seq 1 200); do
    if timeout 600 python -c \
        "import jax, jax.numpy as jnp; float(jnp.ones((8,8)).sum())" \
        >/dev/null 2>&1; then
        echo "--- tunnel up $(date) ---"; break
    fi
    echo "probe $i failed $(date)"; sleep 120
done

timeout 10800 python scripts/psi_matrix.py --out PSI_MATRIX_r3.jsonl \
    --seeds 7 8 9 2>&1 | tail -20
echo "--- matrix done $(date) ---"

timeout 7200 python scripts/dt_ablation.py --out DT_ABLATION4_r3.jsonl \
    --configs dt_prop_24_48 dt_arch_6x384 2>&1 | tail -8
echo "--- dt ablation done $(date) ---"

timeout 2400 python bench.py 2>&1 | tail -2
echo "=== queue6 done $(date) ==="
