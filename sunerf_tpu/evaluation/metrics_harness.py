"""Offline metrics harness: score a trained SuNeRF against ground-truth
viewpoint FITS files with PSNR/SSIM/MAE%/ME%, split into train (|lat| <= 7
deg) and test (|lat| > 7 deg) viewpoints — the PSI evaluation protocol
(reference evaluation/stash/metrics_simulation.py:40-76; training data is
restricted to the ecliptic band at prep time, data/prep/psi.py:29-30).

Usage:
  python -m sunerf_tpu.evaluation.metrics_harness \
      --state runs/psi_193/save_state --data '/mnt/data/psi/193/*.fits' \
      [--lat-split 7.0] [--resolution-scale 1.0] [--output metrics.json]
"""
from __future__ import annotations

import argparse
import glob
import json

import numpy as np

from sunerf_tpu.core.scaling import image_asinh_scaling
from sunerf_tpu.data.fits import read_fits
from sunerf_tpu.data.wcs import parse_observer
from sunerf_tpu.evaluation.loader import SuNeRFLoader
from sunerf_tpu.train.metrics import mae_percent, me_percent, psnr, ssim


def evaluate_viewpoints(loader: SuNeRFLoader, files: list[str],
                        lat_split_deg: float = 7.0,
                        image_scaling: str = 'asinh') -> dict:
    per_view = []
    for path in files:
        data, header = read_fits(path)
        obs = parse_observer(header)
        wl = [obs.wavelength] if obs.wavelength else None
        view = loader.render_observer_image(
            lat=obs.carrington_lat, lon=obs.carrington_lon,
            time=obs.time, distance=obs.dsun_rs,
            resolution=data.shape[0], wavelengths=wl)
        pred = view.image[:, :, 0]
        target = data.astype(np.float32)
        if image_scaling == 'asinh':
            pred = np.asarray(image_asinh_scaling(pred))
            target = np.asarray(image_asinh_scaling(target))
        per_view.append({
            'file': path,
            'lat_deg': float(np.rad2deg(obs.carrington_lat)),
            'lon_deg': float(np.rad2deg(obs.carrington_lon)),
            'psnr': psnr(pred, target),
            'ssim': ssim(pred, target,
                         data_range=float(target.max() - target.min() or 1)),
            'mae_percent': mae_percent(pred, target),
            'me_percent': me_percent(pred, target),
        })

    def summarize(views):
        if not views:
            return {}
        return {k: float(np.mean([v[k] for v in views]))
                for k in ('psnr', 'ssim', 'mae_percent', 'me_percent')}

    train = [v for v in per_view if abs(v['lat_deg']) <= lat_split_deg]
    test = [v for v in per_view if abs(v['lat_deg']) > lat_split_deg]
    return {'train': summarize(train), 'test': summarize(test),
            'all': summarize(per_view), 'n_train': len(train),
            'n_test': len(test), 'views': per_view}


def main(argv=None):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    parser = argparse.ArgumentParser()
    parser.add_argument('--state', required=True)
    parser.add_argument('--data', required=True, help='glob of ground-truth FITS')
    parser.add_argument('--lat-split', type=float, default=7.0)
    parser.add_argument('--batch-size', type=int, default=4096)
    parser.add_argument('--scaling', default='asinh', choices=['asinh', 'none'])
    parser.add_argument('--output', default=None)
    parser.add_argument('--eval-stratified', type=int, default=None,
                        help='override the train-time stratified sample '
                             'count for evaluation renders '
                             '(SuNeRFLoader render_overrides)')
    parser.add_argument('--eval-hierarchical', type=int, default=None)
    args = parser.parse_args(argv)

    overrides = {}
    if args.eval_stratified is not None:
        overrides['n_stratified'] = args.eval_stratified
    if args.eval_hierarchical is not None:
        overrides['n_hierarchical'] = args.eval_hierarchical
    if args.state.endswith('.shlo'):
        # serving artifact: score the EXACT deployed program (sample
        # budget/tier are baked at export; overrides there instead)
        if overrides:
            parser.error('--eval-* overrides are baked into .shlo '
                         'artifacts at export time '
                         '(evaluation.serving --n-stratified/...)')
        from sunerf_tpu.evaluation.serving import ServingModel
        loader = ServingModel(args.state)
    else:
        loader = SuNeRFLoader(args.state, batch_size=args.batch_size,
                              render_overrides=overrides or None)
    files = sorted(glob.glob(args.data))
    result = evaluate_viewpoints(loader, files, args.lat_split, args.scaling)
    summary = {k: result[k] for k in ('train', 'test', 'all', 'n_train', 'n_test')}
    print(json.dumps(summary, indent=2))
    if args.output:
        with open(args.output, 'w') as f:
            json.dump(result, f, indent=2)


if __name__ == '__main__':
    main()
