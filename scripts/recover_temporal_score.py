#!/usr/bin/env python
"""Re-score a completed temporal_closed_loop.py workdir WITHOUT retraining.

Round-4 recovery tool: the cpu_queue4 plain-control arm trained for ~8 h but
its stdout JSON went to an unlinked inode (the 0-byte placeholder file was
deleted while the run held it open). The workdir survives with
run/save_state.npz + run/metrics.jsonl + eval/ ground truth, which is
everything the scoring tail of temporal_closed_loop.py needs — this script
replays that tail (same normalization, same asinh scaling, same metrics) on
the saved bundle and prints the same JSON line with "recovered": true.

Usage: python scripts/recover_temporal_score.py WORKDIR [--platform cpu]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('workdir')
    parser.add_argument('--platform', default=None)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from sunerf_tpu.core.scaling import image_asinh_scaling, normalize_datetime
    from sunerf_tpu.data.loaders import load_map_data
    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.train.metrics import psnr as psnr_fn, ssim as ssim_fn

    run_dir = os.path.join(args.workdir, 'run')
    with open(os.path.join(run_dir, 'save_state.json')) as fh:
        meta = json.load(fh)
    with open(os.path.join(run_dir, 'metrics.jsonl')) as fh:
        recs = [json.loads(line) for line in fh]
    spatial = [r for r in recs if 'val_psnr' in r][-1]
    rates = [r['rays_per_sec'] for r in recs if 'rays_per_sec' in r]
    steps = max(r['step'] for r in recs if 'step' in r)

    loader = SuNeRFLoader(os.path.join(run_dir, 'save_state.npz'))
    renderer, params = loader.renderer, loader.params
    # the closed-loop recipe's scaling (temporal_closed_loop.py LossConfig)
    vmax, a = 10.0, 0.005
    from datetime import datetime
    Rs_per_ds = meta['Rs_per_ds']
    seconds_per_dt = meta['seconds_per_dt']
    ref_time = datetime.fromisoformat(meta['ref_time'])

    @jax.jit
    def render_all(params, rays_p, times):
        def body(argsl):
            r, tt = argsl
            out = renderer(params, r[:, 0], r[:, 1], tt, key=None)
            return out['image']
        return jax.lax.map(body, (rays_p, times))

    t_psnrs, t_ssims = [], []
    for path in sorted(glob.glob(os.path.join(args.workdir, 'eval', 'aia',
                                              '193', '*.fits'))):
        m = load_map_data(path, Rs_per_ds=Rs_per_ds)
        t = normalize_datetime(m['time'], seconds_per_dt, ref_time)
        rays = m['all_rays'].astype(np.float32)
        n = rays.shape[0]
        bs = 8192
        n_pad = (n + bs - 1) // bs * bs
        pad = np.zeros((n_pad - n, 2, 3), np.float32)
        rays_p = jnp.asarray(np.concatenate([rays, pad]).reshape(-1, bs, 2, 3))
        times = jnp.full((rays_p.shape[0], bs, 1), t, jnp.float32)
        pred = np.asarray(render_all(params, rays_p, times)
                          ).reshape(n_pad, -1)[:n, 0]
        shape = m['image'].shape
        pred_s = np.asarray(image_asinh_scaling(pred.reshape(shape), vmax, a))
        targ_s = np.asarray(image_asinh_scaling(m['image'], vmax, a))
        t_psnrs.append(psnr_fn(pred_s, targ_s, data_range=1.0))
        t_ssims.append(ssim_fn(pred_s, targ_s, data_range=1.0))

    spec = meta.get('renderer_spec', {})
    render = spec.get('render', {})
    model_cfg = spec.get('model_config', {})
    out = {
        'frames': len(set(meta.get('times', []))), 'steps': steps,
        'budget': [render.get('n_stratified'), render.get('n_hierarchical')],
        'rays_per_sec': float(np.median(rates[1:] or rates)),
        'spatial_val_psnr': round(spatial['val_psnr'], 2),
        'spatial_val_ssim': round(spatial['val_ssim'], 4),
        'temporal_psnr': round(float(np.mean(t_psnrs)), 2),
        'temporal_psnr_min': round(float(np.min(t_psnrs)), 2),
        'temporal_ssim': round(float(np.mean(t_ssims)), 4),
        'n_eval_views': len(t_psnrs),
        'workdir': args.workdir, 'recovered': True,
    }
    if model_cfg.get('grid_rank'):
        out['grid'] = {'size': (model_cfg.get('grid_sizes') or [0])[0],
                       'rank': model_cfg.get('grid_rank'),
                       'time': model_cfg.get('grid_time')}
    print(json.dumps(out))


if __name__ == '__main__':
    main()
