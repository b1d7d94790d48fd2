#!/usr/bin/env python
"""Time-dependent closed loop at scale (ROADMAP 10, real TPU run).

Synthesizes an EVOLVING MHD sequence (F frames of PSI-convention rho/T cubes:
a hydrostatic corona with a streamer whose amplitude grows and whose longitude
drifts), renders V views per trained timestamp through the DT head, trains the
4D emission SuNeRF (n_freqs_time=2, the validated temporal encoding —
RESULTS.md round-1 temporal study), and scores:

  * spatial:   held-out view at a trained timestamp (Trainer.validate)
  * temporal:  ALL V views at the F-1 UNSEEN half-step times, compared
               against the MHD ground truth rendered at those same times
               (the field model's linear frame interpolation defines GT)

Usage: python scripts/temporal_closed_loop.py [--frames 6] [--views 10]
       [--steps 4000] [--resolution 128]

Prints one JSON line with the spatial/temporal PSNR + SSIM.
"""
import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_cubes(data_path: str, n_frames: int, drift: float = 0.5,
                amp_max: float = 4.0):
    """F frames of (rho, T): hydrostatic corona + evolving streamer.

    rho(r, th, ph, f) = 1e8 exp((1/r - 1)/0.1)
                        * (1 + a(f) * streamer(th, ph - ph0(f)))
    with amplitude a: 1.5 -> amp_max and streamer longitude drifting
    `drift` rad across the sequence; T = 1.5 MK (the DT head reads
    temp * 1e6). drift=0.5 is the slow-evolution scene (CPU A/B);
    the dense-cadence TPU case uses drift ~2.0 (fast evolution, where
    the capacity sweep says temporal tables pay, RESULTS.md).
    """
    from sunerf_tpu.data.psi_io import wrhdf_3d
    r = np.linspace(1.0, 1.3, 24)
    th = np.linspace(0.0, np.pi, 32)
    ph = np.linspace(0.0, 2 * np.pi, 64)
    R = r[None, None, :]
    TH = th[None, :, None]
    PH = ph[:, None, None]
    for f in range(n_frames):
        s = f / max(n_frames - 1, 1)
        a = 1.5 + (amp_max - 1.5) * s
        ph0 = 1.0 + drift * s
        dph = np.angle(np.exp(1j * (PH - ph0)))  # wrapped angular distance
        streamer = np.exp(-(dph ** 2) / 0.1 - ((TH - np.pi / 2) ** 2) / 0.05)
        rho = 1e8 * np.exp((1.0 / R - 1.0) / 0.1) * (1.0 + a * streamer)
        temp = np.full_like(rho, 1.5)
        for var, cube in (('rho', rho), ('t', temp)):
            d = os.path.join(data_path, var)
            os.makedirs(d, exist_ok=True)
            wrhdf_3d(os.path.join(d, f'{var}00{100 + f}.h5'),
                     r, th, ph, cube.astype(np.float32))


def view_list(n_views: int, times, name='aia'):
    obs = []
    for t in times:
        for i in range(n_views):
            obs.append({'name': name, 'lat': 6.0 * ((i % 3) - 1),
                        'lon': i * (360.0 / n_views), 'distance': 215.0,
                        'time': float(t)})
    return obs


def render_set(workdir, sub, data_path, observers, resolution, pif):
    from sunerf_tpu.evaluation.image_render import render_observers
    out = os.path.join(workdir, sub)
    render_observers({
        'model': 'MHDModel', 'data_path': data_path,
        'render_path': out, 'render_format': ['fits'],
        'resolution': resolution, 'wavelengths': [193],
        'batch_size': 8192, 'pixel_intensity_factor': pif,
        'observers': observers,
    })
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--frames', type=int, default=6)
    parser.add_argument('--drift', type=float, default=0.5,
                        help='streamer longitude drift (rad) across the '
                             'sequence; 0.5 = slow evolution, ~2.0 = the '
                             'fast-evolution dense-cadence case')
    parser.add_argument('--amp-max', type=float, default=4.0,
                        help='final streamer amplitude (starts at 1.5)')
    parser.add_argument('--views', type=int, default=10)
    parser.add_argument('--steps', type=int, default=4000)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--workdir', default=None)
    # HexPlane-style 4-D factorized grid on the field (fields.py grid_time):
    # --grid-size 32 --grid-rank 16 --grid-time 8 adds low-rank space-time
    # tables spanning the [0, 1] normalized training window, with the NGP
    # optimizer recipe the tables require (RESULTS.md capacity A/B).
    parser.add_argument('--grid-size', type=int, default=0)
    parser.add_argument('--grid-rank', type=int, default=16)
    parser.add_argument('--grid-time', type=int, default=8)
    parser.add_argument('--table-tv', type=float, default=0.0)
    parser.add_argument('--platform', default=None,
                        help="force a jax platform (e.g. 'cpu' for offline "
                             'mini runs; default = the environment backend)')
    # sample budget (defaults = reference parity 64+128; CPU mini runs
    # should cut this — the closed-loop conclusions track relative quality)
    parser.add_argument('--n-stratified', type=int, default=64)
    parser.add_argument('--n-hierarchical', type=int, default=128)
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from sunerf_tpu.core.scaling import image_asinh_scaling
    from sunerf_tpu.data.fits import read_fits
    from sunerf_tpu.data.loaders import build_single_channel_data, load_map_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.metrics import psnr as psnr_fn, ssim as ssim_fn
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    workdir = args.workdir or tempfile.mkdtemp(prefix='temporal_loop_')
    data_path = os.path.join(workdir, 'cubes')
    synth_cubes(data_path, args.frames, drift=args.drift,
                amp_max=args.amp_max)

    # calibrate pixel_intensity_factor so the brightest frame peaks ~3
    # (the asinh scaling_vmax=10 operating range of the closed-loop recipe)
    probe = render_set(workdir, 'probe', data_path,
                       view_list(1, [1.0]), 64, 1.0)
    img, _ = read_fits(sorted(
        __import__('glob').glob(os.path.join(probe, 'aia', '193', '*.fits')))[0])
    pif = 3.0 / max(float(np.percentile(img, 99.9)), 1e-30)

    F, V = args.frames, args.views
    train_times = [f / (F - 1) for f in range(F)]
    eval_times = [(f + 0.5) / (F - 1) for f in range(F - 1)]
    train_dir = render_set(workdir, 'train', data_path,
                           view_list(V, train_times), args.resolution, pif)
    eval_dir = render_set(workdir, 'eval', data_path,
                          view_list(V, eval_times), args.resolution, pif)

    data = build_single_channel_data(
        os.path.join(train_dir, 'aia', '193', '*.fits'),
        os.path.join(workdir, 'work'), batch_size=1024)

    grid_kwargs, optim_kwargs, tv = {}, {}, {}
    if args.grid_size and args.grid_time and args.frames < 8:
        print(f'WARNING: grid_time={args.grid_time} with only '
              f'{args.frames} frames — the temporal tables silently '
              'overfit sparse cadences (unseen-time error exploded 10x at '
              '4 frames, RESULTS.md capacity sweep); prefer --grid-time 0 '
              'or more frames', file=sys.stderr)
    if args.grid_size:
        # training times are normalized to [0, 1] (frames at f/(F-1) model
        # days, ref_time = the first frame) — the tplane window matches
        grid_kwargs = dict(grid_sizes=(args.grid_size,),
                           grid_rank=args.grid_rank,
                           grid_time=args.grid_time,
                           grid_time_range=(0.0, 1.0), grid_bound=1.3)
        optim_kwargs = dict(table_lr_mult=10.0, adam_eps=1e-15)
        tv = dict(lambda_table_tv=args.table_tv) if args.table_tv else {}

    renderer, init = make_emission_system(
        model_config=emission_config(n_freqs_time=2, **grid_kwargs),
        n_stratified=args.n_stratified, n_hierarchical=args.n_hierarchical)
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(lambda_regularization=0.1, scaling_vmax=10.0,
                               **tv),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3,
                                 **optim_kwargs),
        # the flat-1e-3 recipe sits on an Adam+sine knife edge: one spike
        # step can collapse the run for good (RESULTS.md stability note).
        # k=10: the observed collapse spike is ~200x while normal batch-loss
        # variance stays under ~3x (k=3 misfired on bright-limb batches)
        spike_guard=10.0,
        trainer_config=TrainerConfig(total_steps=args.steps,
                                     val_every=args.steps,
                                     checkpoint_every=args.steps,
                                     log_every=max(args.steps // 10, 1),
                                     save_val_images=False),
        workdir=os.path.join(workdir, 'run'))
    trainer.fit()
    with open(os.path.join(workdir, 'run', 'metrics.jsonl')) as fh:
        recs = [json.loads(line) for line in fh]
    spatial = [r for r in recs if 'val_psnr' in r][-1]
    rates = [r['rays_per_sec'] for r in recs if 'rays_per_sec' in r]

    # temporal scoring: render the trained field at the unseen times with the
    # EXACT geometry/time normalization of the eval ground-truth FITS
    from sunerf_tpu.core.scaling import normalize_datetime
    params = jax.tree.map(np.asarray, trainer.state.params)
    vmax = trainer.loss_config.scaling_vmax
    a = trainer.loss_config.scaling_a
    t_psnrs, t_ssims = [], []

    @jax.jit
    def render_all(params, rays_p, times):
        def body(args):
            r, tt = args
            out = renderer(params, r[:, 0], r[:, 1], tt, key=None)
            return out['image']
        return jax.lax.map(body, (rays_p, times))

    import glob as _glob
    for path in sorted(_glob.glob(os.path.join(eval_dir, 'aia', '193',
                                               '*.fits'))):
        m = load_map_data(path, Rs_per_ds=data.Rs_per_ds)
        t = normalize_datetime(m['time'], data.seconds_per_dt, data.ref_time)
        rays = m['all_rays'].astype(np.float32)
        n = rays.shape[0]
        bs = 8192
        n_pad = (n + bs - 1) // bs * bs
        pad = np.zeros((n_pad - n, 2, 3), np.float32)
        rays_p = jnp.asarray(np.concatenate([rays, pad])
                             .reshape(-1, bs, 2, 3))
        times = jnp.full((rays_p.shape[0], bs, 1), t, jnp.float32)
        pred = np.asarray(render_all(params, rays_p, times)
                          ).reshape(n_pad, -1)[:n, 0]
        shape = m['image'].shape
        pred_s = np.asarray(image_asinh_scaling(pred.reshape(shape), vmax, a))
        targ_s = np.asarray(image_asinh_scaling(m['image'], vmax, a))
        t_psnrs.append(psnr_fn(pred_s, targ_s, data_range=1.0))
        t_ssims.append(ssim_fn(pred_s, targ_s, data_range=1.0))

    print(json.dumps({
        'frames': F, 'views_per_time': V, 'steps': args.steps,
        'drift': args.drift, 'amp_max': args.amp_max,
        'budget': [args.n_stratified, args.n_hierarchical],
        **({'grid': {'size': args.grid_size, 'rank': args.grid_rank,
                     'time': args.grid_time, 'table_tv': args.table_tv}}
           if args.grid_size else {}),
        'rays_per_sec': float(np.median(rates[1:] or rates)),
        'spatial_val_psnr': round(spatial['val_psnr'], 2),
        'spatial_val_ssim': round(spatial['val_ssim'], 4),
        'temporal_psnr': round(float(np.mean(t_psnrs)), 2),
        'temporal_psnr_min': round(float(np.min(t_psnrs)), 2),
        'temporal_ssim': round(float(np.mean(t_ssims)), 4),
        'n_eval_views': len(t_psnrs),
        'workdir': workdir}))


if __name__ == '__main__':
    main()
