#!/usr/bin/env python
"""Round-5 DT production-protocol matrix (VERDICT r4 #4): 256 px, FIVE AIA
channels (94/131/171/193/211 — the hot-blob scene gives 94/131 structure of
their own), union-lambda mask exercise (odd ecliptic views come from a
second instrument source missing 94/131), keep_best + drift-probe traces.

Arms per seed:
  * dt_parity        — 64+128 at the base step count (equal-WALL-CLOCK
                       anchor; rates from DT_MATRIX_r4: parity 47.3k,
                       prop_24_48 ~145k, tiered_warm ~167k rays/s)
  * dt_parity_eq     — parity at the FAST arm's step count: the properly
                       converged parity control VERDICT r4 #4 requires, so
                       the dominance claim no longer rests on an
                       under-trained baseline
  * dt_prop_24_48    — proposal 4x128 + 24+48, equal wall-clock
  * dt_tiered_warm   — tiered (warmed 1750 steps), equal wall-clock
  * dt_long          — prop_24_48 at 4x steps: the long-schedule row whose
                       drift-probe trace VERDICT asks for

One TPU chip: run nothing else on the TPU while this runs. Idempotent:
completed rows in the output jsonl are skipped.

Usage: python scripts/dt_matrix_r5.py [--out DT_MATRIX_r5.jsonl] [--seeds 7 8]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WAVELENGTHS = [94, 131, 171, 193, 211]
BASE_STEPS = 8000  # parity anchor (2x the r4 matrix: 256 px production row)

CONFIGS = [
    # (label, steps, extra args)
    ('dt_parity', BASE_STEPS, []),
    ('dt_parity_eq', 24000, []),
    ('dt_prop_24_48', 24000, ['--proposal-coarse', '--n-stratified', '24',
                              '--n-hierarchical', '48']),
    ('dt_tiered_warm', 28000, ['--proposal-coarse', '--n-stratified', '32',
                               '--n-hierarchical', '64', '--tier-fraction',
                               '0.5', '--tier-samples', '16',
                               '--tier-warmup-steps', '1750']),
    ('dt_long', 96000, ['--proposal-coarse', '--n-stratified', '24',
                        '--n-hierarchical', '48']),
]

COMMON = ['--resolution', '256', '--wavelengths'] + \
    [str(w) for w in WAVELENGTHS] + \
    ['--hot-blob', '--mask-exercise', '--keep-best']


def run_signature(steps, extra, seed):
    """The config dict dt_protocol.py will record for this invocation."""
    def val(flag, default):
        return extra[extra.index(flag) + 1] if flag in extra else default
    proposal = '--proposal-coarse' in extra
    sig = {
        'head': 'density_temperature',
        'wavelengths': WAVELENGTHS,
        'n_stratified': int(val('--n-stratified', 64)),
        'n_hierarchical': int(val('--n-hierarchical', 128)),
        'proposal_coarse': proposal,
        'coarse_shape': ([int(val('--coarse-layers', 4)),
                          int(val('--coarse-filter', 128))]
                         if proposal else None),
        'steps': steps,
        'tier_fraction': float(val('--tier-fraction', 0.0)),
        'tier_samples': int(val('--tier-samples', 16)),
        'seed': seed,
        'keep_best': True,
        'resolution': 256,
        'hot_blob': True,
        'mask_exercise': {'dropped_from_odd_views': WAVELENGTHS[:2]},
    }
    if '--tier-warmup-steps' in extra:
        sig['tier_warmup_steps'] = int(val('--tier-warmup-steps', 0))
    return sig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='DT_MATRIX_r5.jsonl')
    parser.add_argument('--seeds', type=int, nargs='+', default=[7, 8])
    parser.add_argument('--data-cache', default='/tmp/dt_scene_cache_r5')
    parser.add_argument('--only', nargs='+', default=None)
    args = parser.parse_args()

    configs = [c for c in CONFIGS
               if args.only is None or c[0] in args.only]

    done = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = [json.loads(line)['config'] for line in fh if line.strip()]

    total = len(configs) * len(args.seeds)
    i = 0
    for seed in args.seeds:
        for label, steps, extra in configs:
            i += 1
            sig = run_signature(steps, extra, seed)
            if sig in done:
                print(f'[{i}/{total}] {label} s{seed}: already done, skip',
                      flush=True)
                continue
            cmd = [sys.executable, os.path.join(ROOT, 'scripts',
                                                'dt_protocol.py'),
                   '--steps', str(steps), '--seed', str(seed),
                   '--out', args.out,
                   '--data-cache', args.data_cache] + COMMON + extra
            print(f'[{i}/{total}] {label} s{seed}: running', flush=True)
            r = subprocess.run(cmd)
            if r.returncode != 0:
                print(f'[{i}/{total}] {label} s{seed}: FAILED '
                      f'rc={r.returncode}', flush=True)
    print(f'matrix done -> {args.out}')


if __name__ == '__main__':
    main()
