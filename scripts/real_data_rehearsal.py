#!/usr/bin/env python
"""Real-data dress rehearsal, as far as offline allows (VERDICT r2 #9).

No network: real JSOC exports cannot be fetched here. Instead this runs the
FULL real-data path on maximally JSOC-shaped inputs: SimpleStar AIA renders
re-packaged as lev1-style tile-compressed FITS — RICE_1 tiles, float
quantization with SUBTRACTIVE_DITHER_2 (the JSOC default; exercises the
exact seeded-dither decode), per-tile ZSCALE/ZZERO columns, QUALITY/T_OBS/
WAVELNTH/HISTORY cards, padded string values — then `prep sdo` (degradation
correction by table, resample, SDO norms) -> emission training -> held-out
metrics. The compressor is the independent in-test implementation
(tests/test_fits_compressed.py), so the reader is exercised against files
this module did not write.

Usage: python scripts/real_data_rehearsal.py [--steps 1500] [--out FILE]
"""
import argparse
import glob
import json
import os
import sys
import tempfile
from datetime import datetime

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, 'tests'))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def jsocify(src: str, dst_dir: str) -> str:
    """Re-package a plain FITS as a JSOC-lev1-style tile-compressed file."""
    from test_fits_compressed import write_tile_compressed

    from sunerf_tpu.data.fits import read_fits
    data, header = read_fits(src)
    extra = []
    skip = {'SIMPLE', 'BITPIX', 'NAXIS', 'NAXIS1', 'NAXIS2', 'EXTEND',
            'BSCALE', 'BZERO'}
    for k, v in header.cards.items():
        if k not in skip:
            extra.append((k, v))
    extra += [('QUALITY', 0), ('LVL_NUM', 1.5), ('INSTRUME', 'AIA_3'),
              ('ORIGIN', 'SDO/JSOC-SDP')]
    os.makedirs(dst_dir, exist_ok=True)
    dst = os.path.join(dst_dir, os.path.basename(src))
    # DITHER_2: the JSOC compress default (exact zeros preserved); zscale
    # from the data range like fpack's qlevel heuristic
    finite = data[np.isfinite(data)]
    q = max(float(np.std(finite)) / 64.0, 1e-12)
    import zlib
    seed = (zlib.crc32(os.path.basename(src).encode()) % 10000) + 1
    write_tile_compressed(dst, data.astype(np.float32), tile_rows=16,
                          quantize=q, dither='SUBTRACTIVE_DITHER_2',
                          zdither0=seed, extra_cards=tuple(extra))
    return dst


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=1500)
    parser.add_argument('--resolution', type=int, default=128)
    parser.add_argument('--seed', type=int, default=7)
    parser.add_argument('--workdir', default=None)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from occupancy_ablation import run_variant

    from sunerf_tpu.data.fits import read_fits
    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.data.prep import prep_file
    from sunerf_tpu.evaluation.image_render import render_observers

    workdir = args.workdir or tempfile.mkdtemp(prefix='rehearsal_')

    # 1. synthesize AIA-like observations (2014: degradation-era timestamps)
    observers = [{'name': 'aia', 'lat': 5.0 * ((i % 3) - 1), 'lon': i * 45.0,
                  'distance': 215.0,
                  'time': datetime(2014, 1, 15).isoformat()}
                 for i in range(8)]
    render_observers({
        'model': 'SimpleStar',
        'render_path': os.path.join(workdir, 'renders'),
        'render_format': ['fits'], 'resolution': args.resolution,
        'wavelengths': [193], 'batch_size': 4096,
        'pixel_intensity_factor': 1e9, 'observers': observers})

    # 2. re-package as JSOC-style compressed lev1 files
    raw_dir = os.path.join(workdir, 'jsoc_raw')
    n = 0
    for f in sorted(glob.glob(os.path.join(workdir, 'renders', 'aia', '193',
                                           '*.fits'))):
        jsocify(f, raw_dir)
        n += 1
    print(f'jsocified {n} files (RICE_1 + SUBTRACTIVE_DITHER_2)')

    # 3. prep sdo: decompress, degradation-correct, resample, normalize
    prep_dir = os.path.join(workdir, 'prep')
    n_prep = 0
    for f in sorted(glob.glob(os.path.join(raw_dir, '*.fits'))):
        if prep_file(f, prep_dir, 'sdo', resolution=args.resolution):
            n_prep += 1
    assert n_prep == n, f'prep dropped files: {n_prep}/{n}'

    # sanity: prep of the jsocified (RICE + DITHER_2) file must match prep of
    # the original uncompressed render up to quantization noise — running the
    # SAME prep on both isolates exactly the compress/decode error
    first_render = sorted(glob.glob(
        os.path.join(workdir, 'renders', 'aia', '193', '*.fits')))[0]
    ref_prep = prep_file(first_render, os.path.join(workdir, 'prep_ref'),
                         'sdo', resolution=args.resolution)
    a, _ = read_fits(ref_prep)
    b, _ = read_fits(sorted(glob.glob(os.path.join(prep_dir, '*.fits')))[0])
    assert np.isfinite(b).all(), 'NaNs leaked through prep'
    scale = float(np.abs(a).max()) or 1.0
    quant_err = float(np.max(np.abs(a - b))) / scale
    assert quant_err < 5e-3, \
        f'compressed prep deviates from uncompressed: rel err {quant_err:.2e}'
    print(f'prep compress/decode rel err {quant_err:.2e} (vs uncompressed)')

    # 4. train + held-out metrics
    data = build_single_channel_data(
        os.path.join(prep_dir, '*.fits'),
        os.path.join(workdir, 'work'), batch_size=1024)
    result = run_variant('rehearsal', data, workdir, args.steps,
                         seed=args.seed, n_stratified=64, n_hierarchical=128)

    out = {'rehearsal': result, 'n_files': n, 'steps': args.steps,
           'pipeline': 'SimpleStar -> JSOC-style RICE+DITHER_2 -> prep sdo '
                       '-> train -> held-out metrics',
           'workdir': workdir}
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as fh:
            json.dump(out, fh, indent=2)


if __name__ == '__main__':
    main()
