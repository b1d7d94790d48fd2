#!/usr/bin/env python
"""DT-head quality ablation: proposal coarse field + adaptive per-ray budgets
on the multi-thermal closed loop (VERDICT r2 #1 'a DT proposal run').

SimpleStar rendered at 4 AIA wavelengths from 8 viewpoints -> multi-thermal
loader -> DT SuNeRF (raw intensities, per-lambda log_abs, T-response
synthesis) x {parity 64+128, proposal 4x128, tiered half} x seeds, scored on
the held-out view. Equal steps (conservative for the accelerated configs).

Usage: python scripts/dt_ablation.py [--steps 3000] [--seeds 7 8 9]
"""
import argparse
import json
import os
import sys
import tempfile
from datetime import datetime, timedelta

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVELENGTHS = [171, 193, 211, 304]


def run_variant(name, data, workdir, steps, seed, **sys_kwargs):
    from sunerf_tpu.systems import make_density_temperature_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    # pixel_intensity_factor=1e17 is the reference module default
    # (sunerf.py:155) and is load-bearing for LIFTOFF, not just scale: the
    # DT head is multiplicative (image ~ exp(2 log_rho) * R(log_T) * pif), so
    # gradient magnitude is proportional to prediction magnitude. At the
    # base init (log_rho=10, log_T=5), pif=1e17 puts init predictions at
    # O(10) ~ the target scale (live gradients); the first two ablation
    # attempts trained at the GENERATION pif of 1e9, which put init
    # predictions at 1e-10 — gradients ~1e-10, and every config collapsed to
    # the zero-prediction score (PSNR -8.76, a scene constant;
    # DT_ABLATION_r3 / DT_ABLATION2_r3, RESULTS.md). The trained field
    # compensates with log_rho ~ 4 below the generating SimpleStar's.
    renderer, init = make_density_temperature_system(
        pixel_intensity_factor=1e17, **sys_kwargs)
    # grid-encoded fields REQUIRE the NGP table recipe (RESULTS.md
    # capacity A/B: grids are worse than plain MLPs without it)
    grid = bool(getattr(sys_kwargs.get('model_config'), 'grid_sizes', ()))
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(image_scaling='none',
                               lambda_regularization=0.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_end=1e-4,
                                 lr_iterations=steps, lr_floor=1e-4,
                                 table_lr_mult=10.0 if grid else 1.0,
                                 adam_eps=1e-15 if grid else 1e-8),
        # no spike guard: raw multi-thermal intensities have huge ORDINARY
        # inter-batch loss variance (train-batch loss ~16k vs val-view loss
        # ~54 in the first attempt), which tripped the guard 2980/3000 steps
        # and trained nothing (DT_ABLATION_r3; the latch itself is fixed in
        # train/step.py, but guard-off is the right control for a quality
        # ablation on this scene)
        spike_guard=None,
        trainer_config=TrainerConfig(total_steps=steps, val_every=steps,
                                     checkpoint_every=steps,
                                     log_every=max(steps // 10, 1),
                                     save_val_images=False, seed=seed),
        workdir=os.path.join(workdir, name))
    trainer.fit()
    with open(os.path.join(workdir, name, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    rates = [r['rays_per_sec'] for r in recs if 'rays_per_sec' in r]
    val = [r for r in recs if 'val_psnr' in r][-1]
    return {'name': name, 'rays_per_sec': float(np.median(rates[1:] or rates)),
            'val_psnr': val['val_psnr'], 'val_ssim': val['val_ssim']}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=3000)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--seeds', type=int, nargs='+', default=[7, 8, 9])
    parser.add_argument('--workdir', default=None)
    parser.add_argument('--out', default=None)
    parser.add_argument('--configs', nargs='+', default=None,
                        help='run only these named configs (default: all)')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.data.loaders import build_multi_thermal_data
    from sunerf_tpu.evaluation.image_render import render_observers
    from sunerf_tpu.models.fields import density_temperature_config

    workdir = args.workdir or tempfile.mkdtemp(prefix='dt_ablation_')
    # distinct timestamps so the multi-thermal loader's 5-min datetime join
    # (reference multi_thermal_loader.py:119-140) forms one stack per view;
    # 10-min spacing is invisible to the band-limited time encoding below,
    # so the scene is still effectively static for the sampling comparison
    observers = [{'name': 'aia', 'lat': 5.0 * ((i % 3) - 1), 'lon': i * 45.0,
                  'distance': 215.0,
                  'time': (datetime(2012, 8, 23)
                           + timedelta(minutes=10 * i)).isoformat()}
                 for i in range(8)]
    render_observers({
        'model': 'SimpleStar',
        'render_path': os.path.join(workdir, 'renders'),
        'render_format': ['fits'], 'resolution': args.resolution,
        'wavelengths': WAVELENGTHS, 'batch_size': 4096,
        'pixel_intensity_factor': 1e9, 'observers': observers})
    data = build_multi_thermal_data(os.path.join(workdir, 'renders'),
                                    os.path.join(workdir, 'work'),
                                    batch_size=1024)

    # n_freqs_time=2: the 10-min observer spacing must not be memorizable
    # along the time axis (RESULTS.md temporal note)
    model = density_temperature_config(n_freqs_time=2)
    proposal = density_temperature_config(n_layers=4, d_filter=128,
                                          n_freqs_time=2)
    configs = [
        ('dt_parity_64_128', dict(model_config=model, n_stratified=64,
                                  n_hierarchical=128)),
        ('dt_proposal', dict(model_config=model, n_stratified=64,
                             n_hierarchical=128, coarse_config=proposal)),
        ('dt_tiered_half', dict(model_config=model, n_stratified=32,
                                n_hierarchical=64, coarse_config=proposal,
                                tier_fraction=0.5, tier_samples=16)),
        # plain proposal-placed budget cut, no tier — the config that
        # DOMINATES on the emission head (RESULTS.md psi_193 matrix): does
        # the lever generalize to the multiplicative DT head?
        ('dt_prop_24_48', dict(model_config=model, n_stratified=24,
                               n_hierarchical=48, coarse_config=proposal)),
        # architecture axis on the DT head (emission-head evidence:
        # RESULTS.md arch rows; the DT step is the same fused MLP + a
        # per-wavelength quadrature)
        ('dt_arch_6x384', dict(
            model_config=density_temperature_config(
                n_layers=6, d_filter=384, n_freqs_time=2),
            n_stratified=24, n_hierarchical=48, coarse_config=proposal)),
        # feature-grid fine field on the DT head (the multiplicative head's
        # liftoff physics above could interact with the table recipe)
        ('dt_grid_4x128', dict(
            model_config=density_temperature_config(
                n_layers=4, d_filter=128, n_freqs_time=2,
                grid_sizes=(16, 32), grid_features=8, grid_bound=1.3),
            n_stratified=24, n_hierarchical=48, coarse_config=proposal)),
    ]
    if args.configs:
        configs = [c for c in configs if c[0] in args.configs]
    summary = {}
    for cname, kwargs in configs:
        runs = [run_variant(f'{cname}_s{s}', data, workdir, args.steps,
                            seed=s, **kwargs) for s in args.seeds]
        psnrs = [r['val_psnr'] for r in runs]
        summary[cname] = {
            'rays_per_sec': round(float(np.median(
                [r['rays_per_sec'] for r in runs])), 1),
            'psnr_mean': round(float(np.mean(psnrs)), 2),
            'psnr_std': round(float(np.std(psnrs)), 2),
            'psnr_runs': [round(p, 2) for p in psnrs],
            'ssim_mean': round(float(np.mean(
                [r['val_ssim'] for r in runs])), 4),
        }
        print(json.dumps({cname: summary[cname]}), flush=True)
    out = {'dt_ablation': summary, 'seeds': args.seeds,
           'wavelengths': WAVELENGTHS, 'workdir': workdir}
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'a') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
