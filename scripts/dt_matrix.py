#!/usr/bin/env python
"""Round-4 DT north-star matrix driver (VERDICT r3 #2): 3 seeds x
equal-wall-clock configurations on the multi-thermal MHD protocol
(scripts/dt_protocol.py), idempotent (completed rows in the output jsonl
are skipped) and scene-cached.

Step counts equalize wall-clock against the 4k-step DT parity row using
the measured DT rates (DT_ABLATION3_r3: parity 47.3k, tiered_half 167.2k
= 3.54x) and the emission->DT scaling for prop_24_48 (emission 159.5k x
the ~0.9 DT quadrature factor ~= 145k = 3.05x). Measured rays/s land in
every row for an audit.

One TPU chip: run nothing else on the TPU while this runs.

Usage: python scripts/dt_matrix.py [--out DT_MATRIX_r4.jsonl] [--seeds 7 8 9]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, steps, extra args)
    ('dt_parity', 4000, []),
    ('dt_prop_24_48', 12000, ['--proposal-coarse', '--n-stratified', '24',
                              '--n-hierarchical', '48']),
    ('dt_tiered_half', 14000, ['--proposal-coarse', '--n-stratified', '32',
                               '--n-hierarchical', '64', '--tier-fraction',
                               '0.5', '--tier-samples', '16']),
    # tier warmup: the un-warmed tiered rows collapse to the zero-output
    # constant on this scene (the dim tier samples an untrained coarse
    # CDF and the multiplicative DT head starves — see the tiered rows
    # above / TrainerConfig.tier_warmup_steps); first 1750 steps run the
    # full budget, then the tiers engage
    ('dt_tiered_warm', 14000, ['--proposal-coarse', '--n-stratified', '32',
                               '--n-hierarchical', '64', '--tier-fraction',
                               '0.5', '--tier-samples', '16',
                               '--tier-warmup-steps', '1750']),
]


def run_signature(steps, extra, seed):
    """The config dict dt_protocol.py will record for this invocation."""
    def val(flag, default):
        return extra[extra.index(flag) + 1] if flag in extra else default
    proposal = '--proposal-coarse' in extra
    sig = {
        'head': 'density_temperature',
        'wavelengths': [171, 193, 211],
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
    }
    warmup = int(val('--tier-warmup-steps', 0))
    if warmup:
        sig['tier_warmup_steps'] = warmup
    return sig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='DT_MATRIX_r4.jsonl')
    parser.add_argument('--seeds', type=int, nargs='+', default=[7, 8, 9])
    parser.add_argument('--data-cache', default='/tmp/dt_scene_cache')
    args = parser.parse_args()

    done = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = [json.loads(line)['config'] for line in fh if line.strip()]

    total = len(CONFIGS) * len(args.seeds)
    i = 0
    for seed in args.seeds:
        for label, steps, extra in CONFIGS:
            i += 1
            sig = run_signature(steps, extra, seed)
            if sig in done:
                print(f'[{i}/{total}] {label} s{seed}: already done, skip',
                      flush=True)
                continue
            cmd = [sys.executable,
                   os.path.join(ROOT, 'scripts', 'dt_protocol.py'),
                   '--steps', str(steps), '--seed', str(seed),
                   '--out', args.out, '--data-cache', args.data_cache] + extra
            print(f'[{i}/{total}] {label} s{seed}: running', flush=True)
            r = subprocess.run(cmd)
            if r.returncode != 0:
                print(f'[{i}/{total}] {label} s{seed}: FAILED '
                      f'rc={r.returncode}', flush=True)
    print(f'matrix done -> {args.out}')


if __name__ == '__main__':
    main()
