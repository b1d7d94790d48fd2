#!/usr/bin/env python
"""End-to-end DT-head PSI protocol (VERDICT r3 #2: the DT north-star matrix).

The emission psi_193 protocol's multi-channel sibling, built on the
reference's flagship science case (run_density_temperature.py +
rendering/density_temperature.py:192-271): synthetic MHD cubes with
SPATIALLY STRUCTURED temperature (quiet corona 1.1 MK -> bright 171 A;
streamers up to 2.0 MK -> bright 193/211 A, so the per-channel morphology
differs and the T-response must actually be learned) -> MHDModel renders 3
AIA channels at 18 viewpoints (14 ecliptic + 4 high-lat) -> multi-thermal
loader (5-min datetime join, union-lambda masks) on the ECLIPTIC views only
-> DT SuNeRF (raw intensities, pif=1e17 liftoff constant — RESULTS.md DT
attempts 1-3) -> metrics harness over ALL 54 view-channel frames with the
|lat| > 7 deg train/test split.

Usage: python scripts/dt_protocol.py [--steps 4000] [--n-stratified 64]
       [--n-hierarchical 128] [--proposal-coarse] [--resolution 128]
"""
import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
from datetime import datetime, timedelta

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WAVELENGTHS = [171, 193, 211]
N_ECLIPTIC = 14  # observers [0, N_ECLIPTIC) form the training band


def synth_cubes(data_path: str, hot_blob: bool = False):
    """Static MHD frame: hydrostatic corona + two streamers, with the
    streamers HOTTER than the quiet corona (1.1 -> 2.0 MK) so the three
    channels see different structures through the T-response.

    hot_blob adds a compact dense 6 MK active-region core (round-5
    5-channel protocol): the 94/131 A responses peak at logT ~6.85/7.05,
    so without a hot component those channels would only see the cool
    (Fe VIII/X) response tails and their morphology would degenerate to
    171's — the blob gives them structure of their own to learn."""
    from sunerf_tpu.data.psi_io import wrhdf_3d
    r = np.linspace(1.0, 1.3, 24)
    th = np.linspace(0.0, np.pi, 32)
    ph = np.linspace(0.0, 2 * np.pi, 64)
    R, TH, PH = r[None, None, :], th[None, :, None], ph[:, None, None]
    s1 = np.exp(-(np.angle(np.exp(1j * (PH - 1.0))) ** 2) / 0.1
                - ((TH - np.pi / 2) ** 2) / 0.05)
    s2 = np.exp(-(np.angle(np.exp(1j * (PH - 3.8))) ** 2) / 0.2
                - ((TH - np.pi / 2) ** 2) / 0.08)
    streamer = 2.5 * s1 + 1.5 * s2
    rho = 1e8 * np.exp((1.0 / R - 1.0) / 0.1) * (1.0 + streamer)
    # temperature in MK (MHDModel reads log10(1e6 * T), mhd_field.py:101-104):
    # 1.0 MK quiet corona -> 2.5 MK streamer cores spans the 171 (logT ~5.8),
    # 193 (~6.15) and 211 (~6.3) response peaks, so all three channel ratios
    # vary across the scene
    snorm = np.clip((2.5 * s1 + 1.5 * s2) / 2.5, 0.0, 1.0)
    temp = (1.0 + 1.5 * snorm) * np.ones_like(rho)
    if hot_blob:
        # compact low-lying hot core at (lon 5.2, lat +20 deg, r < 1.08):
        # dense (x3 ambient) and 6 MK, off the streamer longitudes so its
        # 94/131 signature is spatially distinct from the 193/211 streamers
        blob = np.exp(-(np.angle(np.exp(1j * (PH - 5.2))) ** 2) / 0.03
                      - ((TH - (np.pi / 2 - 0.35)) ** 2) / 0.02
                      - ((R - 1.0) ** 2) / 0.003)
        rho = rho * (1.0 + 3.0 * blob)
        temp = temp + 4.5 * blob
    for var, cube in (('rho', rho), ('t', temp)):
        d = os.path.join(data_path, var)
        os.makedirs(d, exist_ok=True)
        wrhdf_3d(os.path.join(d, f'{var}00100.h5'), r, th, ph,
                 cube.astype(np.float32))


def make_observers():
    """18 viewpoints, 10-min time spacing (invisible to the band-limited
    n_freqs_time=2 encoding; required by the loader's 5-min datetime join
    so each view forms one lambda-stack)."""
    t0 = datetime(2012, 8, 23)
    obs = [{'name': 'aia', 'lat': 6.0 * ((i % 3) - 1) / 1.5,
            'lon': i * (360.0 / 14), 'distance': 215.0,
            'time': (t0 + timedelta(minutes=10 * i)).isoformat()}
           for i in range(N_ECLIPTIC)]
    obs += [{'name': 'aia', 'lat': lat, 'lon': lon, 'distance': 215.0,
             'time': (t0 + timedelta(minutes=10 * (N_ECLIPTIC + j))
                      ).isoformat()}
            for j, (lat, lon) in enumerate(((-50.0, 30.0), (-25.0, 120.0),
                                            (25.0, 210.0), (50.0, 300.0)))]
    return obs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=4000)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--n-stratified', type=int, default=64)
    parser.add_argument('--n-hierarchical', type=int, default=128)
    parser.add_argument('--proposal-coarse', action='store_true')
    parser.add_argument('--coarse-layers', type=int, default=4)
    parser.add_argument('--coarse-filter', type=int, default=128)
    parser.add_argument('--tier-fraction', type=float, default=0.0)
    parser.add_argument('--tier-samples', type=int, default=16)
    parser.add_argument('--tier-warmup-steps', type=int, default=0,
                        help='train the first N steps at the full fine '
                             'budget before enabling the tiers (the DT '
                             'head collapses when the dim tier samples '
                             'from an untrained coarse CDF)')
    parser.add_argument('--model-layers', type=int, default=8)
    parser.add_argument('--model-filter', type=int, default=512)
    parser.add_argument('--keep-best', action='store_true',
                        help='validate at steps//8 and score the best '
                             'held-out checkpoint (save_state_best)')
    parser.add_argument('--wavelengths', type=int, nargs='+',
                        default=WAVELENGTHS,
                        help='AIA channels to synthesize and train on '
                             '(round-5 production protocol: 94 131 171 '
                             '193 211)')
    parser.add_argument('--hot-blob', action='store_true',
                        help='add a compact 6 MK active-region core to the '
                             'scene so the hot-peaked 94/131 channels have '
                             'structure of their own (see synth_cubes)')
    parser.add_argument('--mask-exercise', action='store_true',
                        help='route the odd-index ecliptic views into a '
                             'second instrument source missing the first '
                             'two --wavelengths channels, exercising the '
                             'union-lambda masks the multi-thermal loader '
                             'pads per source (reference: '
                             'multi_thermal_loader.py:162-168,243-254)')
    parser.add_argument('--platform', default=None)
    parser.add_argument('--seed', type=int, default=7)
    parser.add_argument('--workdir', default=None)
    parser.add_argument('--out', default=None)
    parser.add_argument('--data-cache', default=None,
                        help='shared directory for the synthesized scene')
    args = parser.parse_args()

    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.data.fits import read_fits
    from sunerf_tpu.data.loaders import build_multi_thermal_data
    from sunerf_tpu.evaluation.image_render import render_observers
    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.evaluation.metrics_harness import evaluate_viewpoints
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import make_density_temperature_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    workdir = args.workdir or tempfile.mkdtemp(prefix='dt_protocol_')
    data_dir = args.data_cache or workdir
    marker = os.path.join(data_dir, '.scene_complete')
    raw_dir = os.path.join(data_dir, 'renders')
    train_dir = os.path.join(data_dir, 'train')

    wavelengths = list(args.wavelengths)
    if args.mask_exercise and len(wavelengths) < 4:
        parser.error('--mask-exercise needs >= 4 --wavelengths (the second '
                     'source drops the first two)')

    if not os.path.exists(marker):
        cubes = os.path.join(data_dir, 'cubes')
        synth_cubes(cubes, hot_blob=args.hot_blob)
        observers = make_observers()

        # calibrate pixel intensity so the brightest channel peaks near 0.7
        # (the emission protocol's convention: asinh metrics on a [0, ~1]
        # scale; the TRAINING pif stays 1e17 — liftoff physics, RESULTS.md)
        probe_dir = os.path.join(data_dir, 'probe')
        render_observers({'model': 'MHDModel', 'data_path': cubes,
                          'render_path': probe_dir, 'render_format': ['fits'],
                          'resolution': 64, 'wavelengths': wavelengths,
                          'batch_size': 8192, 'pixel_intensity_factor': 1.0,
                          'observers': observers[:1]})
        peak = max(float(np.percentile(read_fits(f)[0], 99.9))
                   for f in glob.glob(os.path.join(probe_dir, 'aia', '*',
                                                   '*.fits')))
        pif = 0.7 / max(peak, 1e-30)

        render_observers({'model': 'MHDModel', 'data_path': cubes,
                          'render_path': raw_dir, 'render_format': ['fits'],
                          'resolution': args.resolution,
                          'wavelengths': wavelengths, 'batch_size': 8192,
                          'pixel_intensity_factor': pif,
                          'observers': observers})

        # ecliptic-band training cut by observer index (observers [0, 14)
        # are the |lat| <= 7 deg band; the filename carries the index).
        # --mask-exercise routes odd views into a second instrument source
        # that lacks the first two channels (union-lambda mask coverage).
        dropped = set(str(w) for w in wavelengths[:2]) \
            if args.mask_exercise else set()
        n_train = 0
        for f in sorted(glob.glob(os.path.join(raw_dir, 'aia', '*',
                                               '*.fits'))):
            idx = int(os.path.basename(f).split('_')[1].split('.')[0])
            if idx >= N_ECLIPTIC:
                continue
            wl_dir = os.path.basename(os.path.dirname(f))
            source = 'aia'
            if args.mask_exercise and idx % 2 == 1:
                if wl_dir in dropped:
                    continue
                source = 'aia_b'
            dst = os.path.join(train_dir, source, wl_dir)
            os.makedirs(dst, exist_ok=True)
            shutil.copy(f, dst)
            n_train += 1
        print(f'prep: {n_train} train frames (ecliptic), '
              f'{len(glob.glob(os.path.join(raw_dir, "aia", "*", "*.fits")))}'
              f' ground truth')
        with open(marker, 'w') as fh:
            fh.write('ok')
    else:
        print(f'reusing cached scene in {data_dir}')

    data = build_multi_thermal_data(train_dir,
                                    os.path.join(workdir, 'work'),
                                    batch_size=1024)

    model = density_temperature_config(n_layers=args.model_layers,
                                       d_filter=args.model_filter,
                                       n_freqs_time=2)
    coarse = (density_temperature_config(n_layers=args.coarse_layers,
                                         d_filter=args.coarse_filter,
                                         n_freqs_time=2)
              if args.proposal_coarse else None)
    renderer, init = make_density_temperature_system(
        pixel_intensity_factor=1e17, model_config=model,
        coarse_config=coarse, n_stratified=args.n_stratified,
        n_hierarchical=args.n_hierarchical,
        tier_fraction=args.tier_fraction, tier_samples=args.tier_samples)

    run_dir = os.path.join(workdir, 'run')
    trainer = Trainer(
        renderer, init, data,
        # raw multi-thermal intensities (reference sunerf.py:152-224); no
        # spike guard — ordinary inter-batch variance of raw intensities
        # trips it (DT_ABLATION_r3 rationale)
        loss_config=LossConfig(image_scaling='none',
                               lambda_regularization=0.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_end=1e-4,
                                 lr_iterations=args.steps, lr_floor=1e-4),
        spike_guard=None,
        trainer_config=TrainerConfig(
            tier_warmup_steps=args.tier_warmup_steps,
            total_steps=args.steps,
            val_every=(max(args.steps // 8, 1) if args.keep_best
                       else args.steps),
            keep_best=args.keep_best, checkpoint_every=args.steps,
            log_every=max(args.steps // 10, 1),
            # GT-free high-latitude drift probe (train/probe.py):
            # observational render-only metrics; trace summarized into
            # the output row (highlat_probe)
            drift_probe_views=4,
            save_val_images=False, seed=args.seed),
        workdir=run_dir)
    trainer.fit()

    with open(os.path.join(run_dir, 'metrics.jsonl')) as fh:
        recs = [json.loads(line) for line in fh]
    rates = [r['rays_per_sec'] for r in recs if 'rays_per_sec' in r]
    rate = float(np.median(rates[1:] or rates))

    bundle = os.path.join(run_dir, 'save_state.npz')
    if args.keep_best:
        best = os.path.join(run_dir, 'save_state_best.npz')
        if os.path.exists(best):
            bundle = best
    loader = SuNeRFLoader(bundle)
    gt_files = sorted(glob.glob(os.path.join(raw_dir, 'aia', '*', '*.fits')))
    metrics = evaluate_viewpoints(loader, gt_files)
    out = {'config': {'head': 'density_temperature',
                      'wavelengths': wavelengths,
                      'n_stratified': args.n_stratified,
                      'n_hierarchical': args.n_hierarchical,
                      'proposal_coarse': bool(coarse),
                      'coarse_shape': ([args.coarse_layers,
                                        args.coarse_filter] if coarse
                                       else None),
                      'steps': args.steps,
                      'tier_fraction': args.tier_fraction,
                      'tier_samples': args.tier_samples,
                      'seed': args.seed},
           'rays_per_sec': round(rate, 1),
           'train': metrics['train'], 'test': metrics['test'],
           'workdir': workdir}
    if (args.model_layers, args.model_filter) != (8, 512):
        out['config']['model_shape'] = [args.model_layers, args.model_filter]
    if args.tier_warmup_steps:
        out['config']['tier_warmup_steps'] = args.tier_warmup_steps
    if args.resolution != 128:
        # key absent at the mini-protocol default (matches psi_protocol)
        out['config']['resolution'] = args.resolution
    if args.hot_blob:
        # scene-changing: signature key (absent for the r4 3-channel scene)
        out['config']['hot_blob'] = True
    if args.mask_exercise:
        # data-layout-changing: signature key; records which channels the
        # second source lacks
        out['config']['mask_exercise'] = {
            'dropped_from_odd_views': wavelengths[:2]}
    if args.keep_best:
        out['config']['keep_best'] = True
        out['scored_bundle'] = os.path.basename(bundle)
    stab = [round(r['probe_stability_db'], 2) for r in recs
            if 'probe_stability_db' in r]
    drift = [round(r['probe_drift_since_best_db'], 2) for r in recs
             if 'probe_drift_since_best_db' in r]
    if stab or drift:
        # OBSERVATIONAL (render-only; NOT a signature key) — see
        # psi_protocol.py and RESULTS.md round-4 scale section
        out['highlat_probe'] = {
            'stability_db': stab,
            'drift_since_best_db': drift,
            'warnings': int(sum(1 for r in recs
                                if r.get('probe_drift_warning')))}
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'a') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
