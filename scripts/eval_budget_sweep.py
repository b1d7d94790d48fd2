#!/usr/bin/env python
"""Re-score trained psi_193 matrix checkpoints at a DIFFERENT eval-time
sample budget (SuNeRFLoader render_overrides).

Motivation: the matrix (PSI_MATRIX_r3.jsonl) evaluates each run with the
renderer spec it trained with, so a 16+32-budget run is also *rendered* with
16+32 samples — conflating two effects: (a) the field fit worse, (b) the
held-out quadrature is coarser. The training throughput number only depends
on (a): at deployment the render budget is a free choice (the reference
always renders full-budget, sampling.py:6,106). This sweep separates the
two by re-rendering saved checkpoints at the full 64+128 budget.

Usage:
  python scripts/eval_budget_sweep.py [--matrix PSI_MATRIX_r3.jsonl]
      [--gt '/tmp/psi_scene_cache/gt/*.fits'] [--out EVAL_BUDGET_r3.jsonl]
      [--n-stratified 64] [--n-hierarchical 128]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--matrix', default='PSI_MATRIX_r3.jsonl')
    parser.add_argument('--gt', default='/tmp/psi_scene_cache/gt/*.fits')
    parser.add_argument('--out', default='EVAL_BUDGET_r3.jsonl')
    parser.add_argument('--n-stratified', type=int, default=64)
    parser.add_argument('--n-hierarchical', type=int, default=128)
    parser.add_argument('--budgets', type=int, nargs='+', default=None,
                        help='train-time n_stratified values to re-score '
                             '(default: 16 20 24 32)')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.evaluation.metrics_harness import evaluate_viewpoints

    budgets = set(args.budgets or (16, 20, 24, 32))
    rows = [json.loads(l) for l in open(args.matrix) if l.strip()]
    rows = [r for r in rows
            if r['config'].get('proposal_coarse')
            and r['config'].get('tier_fraction', 0.0) == 0.0
            and 'occupancy' not in r['config']
            and r['config']['n_stratified'] in budgets]

    done = []
    if os.path.exists(args.out):
        done = [json.loads(l)['config'] for l in open(args.out) if l.strip()]

    gt_files = sorted(glob.glob(args.gt))
    if not gt_files:
        raise SystemExit(f'no ground-truth FITS match {args.gt}')

    for r in rows:
        sig = dict(r['config'],
                   eval_budget=[args.n_stratified, args.n_hierarchical])
        if sig in done:
            print(f'skip (done): {sig}', flush=True)
            continue
        state = os.path.join(r['workdir'], 'run', 'save_state.npz')
        if not os.path.exists(state):
            print(f'skip (gone): {state}', flush=True)
            continue
        loader = SuNeRFLoader(state, render_overrides={
            'n_stratified': args.n_stratified,
            'n_hierarchical': args.n_hierarchical})
        metrics = evaluate_viewpoints(loader, gt_files)
        out = {'config': sig,
               'trained_test': r['test'],
               'test': metrics['test'], 'train': metrics['train'],
               'rays_per_sec': r['rays_per_sec']}
        print(json.dumps(out), flush=True)
        with open(args.out, 'a') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
