#!/bin/bash
# Round-3 psi_193 north-star matrix: 3 seeds x equal-wall-clock configs
# (VERDICT r2 #1). Step counts equalize wall-clock against the 4k-step
# parity row using measured rays/s (RESULTS.md): parity 47.9k, proposal+
# 32+64 ~119k (-> 10k steps), proposal+40+80 ~95k (-> 8k steps).
# Sequential: one TPU chip; run nothing else on the TPU while this runs.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-PSI_MATRIX_r3.jsonl}
for seed in 7 8 9; do
  # reference-parity baseline
  python scripts/psi_protocol.py --steps 4000 --seed "$seed" --out "$OUT"
  # proposal coarse + half budget, equal wall-clock
  python scripts/psi_protocol.py --steps 10000 --proposal-coarse \
      --n-stratified 32 --n-hierarchical 64 --seed "$seed" --out "$OUT"
  # proposal coarse + moderated budget, equal wall-clock
  python scripts/psi_protocol.py --steps 8000 --proposal-coarse \
      --n-stratified 40 --n-hierarchical 80 --seed "$seed" --out "$OUT"
  # smaller (2x64) proposal field + half budget, equal wall-clock
  python scripts/psi_protocol.py --steps 10000 --proposal-coarse \
      --coarse-layers 2 --coarse-filter 64 \
      --n-stratified 32 --n-hierarchical 64 --seed "$seed" --out "$OUT"
  # adaptive per-ray budgets: full hi budget, dim half at 32 samples
  # (99.8k rays/s -> 8300 steps equal wall-clock)
  python scripts/psi_protocol.py --steps 8300 --proposal-coarse \
      --tier-fraction 0.5 --tier-samples 32 --seed "$seed" --out "$OUT"
  # tiered + half budget (190.8k rays/s -> 16000 steps equal wall-clock)
  python scripts/psi_protocol.py --steps 16000 --proposal-coarse \
      --n-stratified 32 --n-hierarchical 64 \
      --tier-fraction 0.5 --tier-samples 16 --seed "$seed" --out "$OUT"
done
echo "matrix done -> $OUT"
