#!/usr/bin/env python
"""Spike-guard rescue demo on the real collapse recipe (TPU run).

The flat lr=1e-3 SimpleStar recipe deterministically collapsed (loss x250 in
a few tens of steps, RESULTS.md round-2 stability note). This script runs the
collapse-prone configuration (occupancy 40+80, flat lr, seed 7) twice —
without and with the rollback spike guard — and prints both trajectories'
final held-out PSNR plus whether/when each tripped.

Usage: python scripts/spike_guard_demo.py [--steps 3000] [--seed 7]
"""
import argparse
import json
import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(name, data, workdir, steps, seed, spike_guard):

    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    renderer, init = make_emission_system(
        n_stratified=40, n_hierarchical=80,
        occupancy={'enabled': True, 'warmup': 200, 'update_every': 16,
                   'threshold': 0.01, 'floor': 0.05})
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(lambda_regularization=0.1, scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),  # knife edge
        spike_guard=spike_guard,
        trainer_config=TrainerConfig(total_steps=steps, val_every=steps,
                                     checkpoint_every=steps,
                                     log_every=max(steps // 30, 1),
                                     save_val_images=False, seed=seed),
        workdir=os.path.join(workdir, name))
    trainer.fit()
    with open(os.path.join(workdir, name, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    val = [r for r in recs if 'val_psnr' in r][-1]
    losses = [(r['step'], r['loss']) for r in recs if 'loss' in r]
    max_loss = max(l for _, l in losses)
    skips = sum(r.get('update_skipped', 0.0) for r in recs)
    return {'name': name, 'val_psnr': round(val['val_psnr'], 2),
            'val_ssim': round(val['val_ssim'], 4),
            'max_logged_loss': round(max_loss, 5),
            'logged_skip_steps': int(skips)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=3000)
    parser.add_argument('--seed', type=int, default=7)
    parser.add_argument('--resolution', type=int, default=128)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.evaluation.image_render import render_observers

    workdir = tempfile.mkdtemp(prefix='guard_demo_')
    observers = [{'name': 'aia', 'lat': 5.0 * ((i % 3) - 1), 'lon': i * 45.0,
                  'distance': 215.0,
                  'time': datetime(2012, 8, 23).isoformat()}
                 for i in range(8)]
    render_observers({
        'model': 'SimpleStar',
        'render_path': os.path.join(workdir, 'renders'),
        'render_format': ['fits'], 'resolution': args.resolution,
        'wavelengths': [193], 'batch_size': 4096,
        'pixel_intensity_factor': 1e9, 'observers': observers,
    })
    data = build_single_channel_data(
        os.path.join(workdir, 'renders', 'aia', '193', '*.fits'),
        os.path.join(workdir, 'work'), batch_size=1024)

    unguarded = run('unguarded', data, workdir, args.steps, args.seed, None)
    guarded = run('guarded', data, workdir, args.steps, args.seed, 10.0)
    print(json.dumps({'unguarded': unguarded, 'guarded': guarded,
                      'seed': args.seed, 'workdir': workdir}))


if __name__ == '__main__':
    main()
