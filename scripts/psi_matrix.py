#!/usr/bin/env python
"""Round-3 psi_193 north-star matrix driver (VERDICT r2 #1): 3 seeds x
equal-wall-clock configurations, idempotent (completed rows in the output
jsonl are skipped) and scene-cached (--data-cache shared across runs).

Step counts equalize wall-clock against the 4k-step parity row using
measured rays/s (bench.py / RESULTS.md): parity 47.9k; proposal+32+64
~120k -> 10k steps; proposal+40+80 ~95k -> 8k; 2x64-proposal+32+64 -> 10k;
tiered full ~99.8k -> 8.3k; tiered half ~190.8k -> 16k.

One TPU chip: run nothing else on the TPU while this runs.

Usage: python scripts/psi_matrix.py [--out PSI_MATRIX_r3.jsonl] [--seeds 7 8 9]
"""
import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, steps, extra args)
    ('parity', 4000, []),
    ('proposal_half', 10000, ['--proposal-coarse', '--n-stratified', '32',
                              '--n-hierarchical', '64']),
    ('proposal_40_80', 8000, ['--proposal-coarse', '--n-stratified', '40',
                              '--n-hierarchical', '80']),
    ('proposal2x64_half', 10000, ['--proposal-coarse', '--coarse-layers', '2',
                                  '--coarse-filter', '64',
                                  '--n-stratified', '32',
                                  '--n-hierarchical', '64']),
    ('tiered_full', 8300, ['--proposal-coarse', '--tier-fraction', '0.5',
                           '--tier-samples', '32']),
    ('tiered_half', 16000, ['--proposal-coarse', '--n-stratified', '32',
                            '--n-hierarchical', '64', '--tier-fraction',
                            '0.5', '--tier-samples', '16']),
    # round-3 contingency rows targeting >=100k at matched quality
    ('prop2x64_40_80', 8300, ['--proposal-coarse', '--coarse-layers', '2',
                              '--coarse-filter', '64', '--n-stratified',
                              '40', '--n-hierarchical', '80']),
    ('tiered2x64_full', 8700, ['--proposal-coarse', '--coarse-layers', '2',
                               '--coarse-filter', '64', '--tier-fraction',
                               '0.5', '--tier-samples', '32']),
    ('tiered2x64_40_80', 12000, ['--proposal-coarse', '--coarse-layers', '2',
                                 '--coarse-filter', '64', '--n-stratified',
                                 '40', '--n-hierarchical', '80',
                                 '--tier-fraction', '0.5',
                                 '--tier-samples', '24']),
    # round-3b: occupancy v2 rows (robust-max criterion + occ_vol factor) —
    # the psi streamer scene is exactly the shell+blob class the vol factor
    # was built for; steps equalize wall-clock via bench.py rates
    # (occupancy 32+64 ~94.9k, +proposal ~120k, 24+48 est ~150k)
    ('occ_half', 8000, ['--occupancy', '--n-stratified', '32',
                        '--n-hierarchical', '64']),
    ('prop_occ_half', 10000, ['--proposal-coarse', '--occupancy',
                              '--n-stratified', '32',
                              '--n-hierarchical', '64']),
    ('prop_occ_24_48', 12500, ['--proposal-coarse', '--occupancy',
                               '--n-stratified', '24',
                               '--n-hierarchical', '48']),
    # no-grid control for prop_occ_24_48: the occ row hit 143k at
    # matched-or-better 3-seed quality, but the value case says the budget
    # (not the grid) is usually the lever — attribute it properly
    ('prop_24_48', 12500, ['--proposal-coarse', '--n-stratified', '24',
                           '--n-hierarchical', '48']),
    # frontier edge: prop_24_48 landed +1.13 dB over parity at 16.0x —
    # how deep does the proposal-placed budget cut go before quality
    # breaks? Steps equalize wall-clock via bench.py-extrapolated rates
    # (20+40 ~185k, 16+32 ~210k).
    ('prop_20_40', 15000, ['--proposal-coarse', '--n-stratified', '20',
                           '--n-hierarchical', '40']),
    ('prop_16_32', 17500, ['--proposal-coarse', '--n-stratified', '16',
                           '--n-hierarchical', '32']),
    # budget annealing: prop_16_32 underfits (the knee is a TRAINING
    # deficiency — EVAL_BUDGET_r3 full-budget re-eval does not rescue it);
    # a 15% warm phase at 24+48 establishes the field before the cheap
    # budget takes over. Steps equalize wall-clock at the measured phase
    # rates (24+48 159.5k, 16+32 191.2k -> harmonic 185.7k).
    ('anneal_16_32', 15500, ['--proposal-coarse', '--n-stratified', '16',
                             '--n-hierarchical', '32', '--anneal-frac',
                             '0.15', '--anneal-stratified', '24',
                             '--anneal-hierarchical', '48']),
    # architecture axis: the quarter-budget step is still fine-MLP-bound
    # (scripts/probe_overhead.py, same-process A/B: 8x512 6.58 ms, 6x384
    # 3.43 ms = 298k rays/s, 4x256 2.16 ms = 473k). Step counts are BELOW
    # equal wall-clock on purpose: the small fields converge by ~12.5k
    # steps and then DEGRADE (the 25k-step 6x384 row in the jsonl: train
    # batches reach PSNR 43 while re-rendered views fall to 26.4 — NeRF
    # overfit/aliasing under the longer high-lr schedule), so matched
    # quality at LESS wall-clock is the claim, which is strictly stronger.
    ('arch_6x384', 12500, ['--proposal-coarse', '--n-stratified', '24',
                           '--n-hierarchical', '48', '--model-layers', '6',
                           '--model-filter', '384']),
    ('arch_4x256', 20000, ['--proposal-coarse', '--n-stratified', '24',
                           '--n-hierarchical', '48', '--model-layers', '4',
                           '--model-filter', '256']),
    ('arch_6x384_half', 10000, ['--proposal-coarse', '--n-stratified', '32',
                                '--n-hierarchical', '64', '--model-layers',
                                '6', '--model-filter', '384']),
]


def run_signature(steps, extra, seed):
    """The config dict psi_protocol.py will record for this invocation."""
    def val(flag, default):
        return (extra[extra.index(flag) + 1]
                if flag in extra else default)
    proposal = '--proposal-coarse' in extra
    sig = {
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
    if '--occupancy' in extra:  # key absent when off (matches psi_protocol)
        sig['occupancy'] = {'threshold': float(val('--occ-threshold', 0.05)),
                            'floor': float(val('--occ-floor', 0.02))}
    if '--anneal-frac' in extra:  # key absent when off (matches psi_protocol)
        sig['anneal'] = {
            'frac': float(val('--anneal-frac', 0.0)),
            'n_stratified': int(val('--anneal-stratified', 24)),
            'n_hierarchical': int(val('--anneal-hierarchical', 48))}
    shape = (int(val('--model-layers', 8)), int(val('--model-filter', 512)))
    if shape != (8, 512):  # key absent at parity (matches psi_protocol)
        sig['model_shape'] = list(shape)
    if '--grid-sizes' in extra:  # key absent when off (matches psi_protocol)
        gi = extra.index('--grid-sizes') + 1
        sizes = []
        while gi < len(extra) and not extra[gi].startswith('--'):
            sizes.append(int(extra[gi]))
            gi += 1
        sig['grid'] = {'sizes': sizes,
                       'features': int(val('--grid-features', 8)),
                       'bound': float(val('--grid-bound', 1.3))}
        if '--grid-hat-mxu' in extra:
            sig['grid']['hat_mxu'] = True
        if '--table-tv' in extra:
            sig['grid']['table_tv'] = float(val('--table-tv', 0.0))
    if '--table-lr-mult' in extra or '--adam-eps' in extra:
        mult = float(val('--table-lr-mult', 1.0))
        eps = float(val('--adam-eps', 1e-8))
        if (mult, eps) != (1.0, 1e-8):  # matches psi_protocol's optim key
            sig['optim'] = {'table_lr_mult': mult, 'adam_eps': eps}
    if '--keep-best' in extra:  # key absent when off (matches psi_protocol)
        sig['keep_best'] = True
    return sig


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--out', default='PSI_MATRIX_r3.jsonl')
    parser.add_argument('--seeds', type=int, nargs='+', default=[7, 8, 9])
    parser.add_argument('--data-cache', default='/tmp/psi_scene_cache')
    parser.add_argument('--only', nargs='+', default=None,
                        help='run only these config labels (e.g. '
                             '--only arch_6x384 arch_4x256)')
    parser.add_argument('--keep-best', action='store_true',
                        help='append --keep-best to every run (changes row '
                             'semantics/signature: use a separate --out)')
    parser.add_argument('--resolution', type=int, default=128)
    args = parser.parse_args()

    configs = [c for c in CONFIGS
               if args.only is None or c[0] in args.only]
    if args.only and len(configs) != len(args.only):
        known = {c[0] for c in CONFIGS}
        sys.exit(f'unknown --only labels: {set(args.only) - known}')

    done = []
    if os.path.exists(args.out):
        with open(args.out) as fh:
            done = [json.loads(line)['config'] for line in fh if line.strip()]

    total = len(configs) * len(args.seeds)
    i = 0
    for seed in args.seeds:
        for label, steps, extra in configs:
            i += 1
            run_extra = list(extra)
            if args.keep_best and '--keep-best' not in run_extra:
                run_extra.append('--keep-best')
            sig = run_signature(steps, run_extra, seed)
            if args.resolution != 128:
                # matches psi_protocol's conditional resolution key
                sig['resolution'] = args.resolution
            if sig in done:
                print(f'[{i}/{total}] {label} s{seed}: already done, skip',
                      flush=True)
                continue
            cmd = [sys.executable, os.path.join(ROOT, 'scripts',
                                                'psi_protocol.py'),
                   '--steps', str(steps), '--seed', str(seed),
                   '--resolution', str(args.resolution),
                   '--out', args.out,
                   '--data-cache', args.data_cache] + run_extra
            print(f'[{i}/{total}] {label} s{seed}: running', flush=True)
            r = subprocess.run(cmd)
            if r.returncode != 0:
                print(f'[{i}/{total}] {label} s{seed}: FAILED rc={r.returncode}',
                      flush=True)
    print(f'matrix done -> {args.out}')


if __name__ == '__main__':
    main()
