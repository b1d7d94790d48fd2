"""Data pipeline tests: native FITS IO, WCS parsing, ray-shard builders, and
checkpoint round-trips — all on synthetic files."""
import os
from datetime import datetime

import numpy as np
import pytest

from sunerf_tpu.core.geometry import observer_rays
from sunerf_tpu.data.datasets import ArrayDataset, MmapDataset, iterate_batches
from sunerf_tpu.data.fits import Header, read_fits, write_fits
from sunerf_tpu.data.loaders import (build_multi_thermal_data,
                                     build_single_channel_data,
                                     date_from_filename, load_map_data)
from sunerf_tpu.data.norms import block_reduce_mean, normalize, percentile_clip
from sunerf_tpu.data.wcs import (helioprojective_grid, observer_header,
                                 parse_observer)


def _synthetic_fits(path, lat=10.0, lon=30.0, dsun_rs=215.0, res=16,
                    time=datetime(2012, 8, 24, 0, 0, 8), wavelength=193.0,
                    data=None):
    header = observer_header(lat, lon, dsun_rs, time, res, wavelength)
    if data is None:
        rng = np.random.default_rng(0)
        data = rng.uniform(0, 1, (res, res)).astype(np.float32)
    write_fits(path, data, header)
    return data, header


def test_fits_roundtrip(tmp_path):
    path = str(tmp_path / 'test.fits')
    data = np.arange(48, dtype=np.float32).reshape(6, 8) / 7.0
    header = {'DATE-OBS': '2012-08-24T00:00:08.123', 'CRLN_OBS': 30.5,
              'WAVELNTH': 193, 'SIMPLEK': True, 'NOTE': "it's a test"}
    write_fits(path, data, header)
    rdata, rheader = read_fits(path)
    np.testing.assert_array_equal(rdata, data)
    assert rheader['DATE-OBS'] == '2012-08-24T00:00:08.123'
    assert rheader['CRLN_OBS'] == 30.5
    assert rheader['WAVELNTH'] == 193
    assert rheader['SIMPLEK'] is True
    assert rheader['NOTE'] == "it's a test"


def test_fits_int_bscale(tmp_path):
    """BSCALE/BZERO-scaled integer data reads back as physical values."""
    path = str(tmp_path / 'int.fits')
    data = (np.arange(12, dtype=np.int32)).reshape(3, 4)
    write_fits(path, data)
    rdata, rheader = read_fits(path)
    np.testing.assert_array_equal(rdata, data)
    assert rheader['BITPIX'] == 32


def test_observer_header_roundtrip():
    header = Header()
    header.update(observer_header(12.5, 98.0, 210.0,
                                  datetime(2012, 11, 1, 6, 30), 64, 171.0))
    obs = parse_observer(header)
    assert obs.time == datetime(2012, 11, 1, 6, 30)
    np.testing.assert_allclose(np.rad2deg(obs.carrington_lon), 98.0, rtol=1e-6)
    np.testing.assert_allclose(np.rad2deg(obs.carrington_lat), 12.5, rtol=1e-6)
    np.testing.assert_allclose(obs.dsun_rs, 210.0, rtol=1e-6)
    assert obs.wavelength == 171.0


def test_helioprojective_grid_center():
    header = Header()
    header.update(observer_header(0.0, 0.0, 215.0,
                                  datetime(2012, 1, 1), 17, 193.0))
    tx, ty = helioprojective_grid(header, shape=(17, 17))
    # reference pixel (CRPIX = (N+1)/2, 1-based) is the array center
    assert abs(tx[8, 8]) < 1e-9 and abs(ty[8, 8]) < 1e-9
    # the full FOV frames +/- 1.3 Rsun
    expected_half = np.arctan2(1.3, 215.0)
    np.testing.assert_allclose(tx[8, -1], expected_half * (8 / 8.5), rtol=1e-2)


def test_load_map_data_geometry(tmp_path):
    path = str(tmp_path / 'map.fits')
    _synthetic_fits(path, lat=15.0, lon=45.0, dsun_rs=200.0, res=9)
    out = load_map_data(path)
    rays = out['all_rays']
    assert rays.shape == (81, 2, 3)
    # observer distance encoded in ray origins
    np.testing.assert_allclose(np.linalg.norm(rays[0, 0]), 200.0, rtol=1e-4)
    # central pixel looks at the Sun
    center = rays[40]
    d = center[1] / np.linalg.norm(center[1])
    np.testing.assert_allclose(d, -center[0] / np.linalg.norm(center[0]),
                               atol=1e-4)
    assert out['wavelength'] == 193.0


def test_single_channel_builder(tmp_path):
    data_dir = tmp_path / 'maps'
    data_dir.mkdir()
    res = 8
    for i in range(7):
        _synthetic_fits(str(data_dir / f'map_{i:02d}.fits'), lon=i * 30.0,
                        res=res, time=datetime(2012, 8, 20 + i))
    data = build_single_channel_data(str(data_dir / '*.fits'),
                                     str(tmp_path / 'work'),
                                     batch_size=16, n_devices=2)
    # 6 training maps x 64 px = 384 rays; global batch 32
    assert data.train.batch_size == 32
    batch = data.train[0]
    assert batch['rays'].shape == (32, 2, 3)
    assert batch['time'].shape == (32, 1)
    assert batch['target_image'].shape == (32, 1)
    # held-out image = index 7//6 = 1
    assert len(data.valid) >= 1
    vb = data.valid[0]
    assert vb['target_image'].shape[-1] == 1
    assert data.config['type'] == 'emission'
    # ref_time defaults to earliest observation; times normalized in days
    assert data.ref_time == datetime(2012, 8, 20)
    data.clear()
    assert not os.path.exists(list(data.train.batch_files.values())[0])


def test_balanced_multi_dataset(tmp_path):
    """Two datasets of unequal size (30 vs 3 views) train with equal per-step
    representation: the smaller one is resampled with replacement to the
    larger (reference base_loader.py:44-55)."""
    res = 8
    big, small = tmp_path / 'sdo', tmp_path / 'secchi'
    big.mkdir(), small.mkdir()
    for i in range(30):
        _synthetic_fits(str(big / f'map_{i:02d}.fits'), lon=i * 12.0, res=res,
                        time=datetime(2012, 8, 1 + i % 27))
    for i in range(3):
        _synthetic_fits(str(small / f'map_{i}.fits'), lon=i * 120.0, lat=-5.0,
                        res=res, time=datetime(2012, 8, 2 + i))

    data = build_single_channel_data(
        {'sdo': str(big / '*.fits'), 'secchi': str(small / '*.fits')},
        str(tmp_path / 'work'), batch_size=64, n_devices=1)

    assert data.config['datasets'] == {'sdo': 30, 'secchi': 3}
    # 29 training sdo maps (one held out) x 64 px per source after resampling
    n_ref = 29 * res * res
    ids = np.load(data.extras['dataset_ids_path'])
    assert ids.shape[0] == 2 * n_ref
    assert (ids == 0).sum() == n_ref and (ids == 1).sum() == n_ref
    # per-batch provenance is ~50/50 after the global shuffle
    first = ids[:data.train.batch_size]
    frac = (first == 1).mean()
    assert 0.3 < frac < 0.7

    # single-glob path unchanged: no resampling, one dataset
    single = build_single_channel_data(str(big / '*.fits'),
                                       str(tmp_path / 'work2'), batch_size=16)
    sids = np.load(single.extras['dataset_ids_path'])
    assert (sids == 0).all() and sids.shape[0] == n_ref


def test_multi_thermal_builder(tmp_path):
    root = tmp_path / 'mt'
    res = 8
    # two instruments: aia has 171+193, euvi only 193
    for inst, wls in (('aia', (171, 193)), ('euvib', (193,))):
        for wl in wls:
            d = root / inst / str(wl)
            d.mkdir(parents=True)
            for i in range(3):
                t = datetime(2012, 11, 1 + i, 12, 0)
                name = f'{inst}.{t.strftime("%Y-%m-%dT%H:%M:%S")}.{wl}.fits'
                _synthetic_fits(str(d / name), lon=i * 40.0, res=res, time=t,
                                wavelength=float(wl))
    data = build_multi_thermal_data(str(root), str(tmp_path / 'work'),
                                    batch_size=8, n_devices=1)
    assert data.config['wavelengths'] == [171, 193]
    batch = data.train[0]
    assert batch['wavelength'].shape == (8, 2)
    assert batch['target_image'].shape == (8, 2)
    # euvi rows have wavelength (0, 193); aia rows (171, 193)
    wl_rows = {tuple(r) for r in batch['wavelength'].astype(int).tolist()}
    assert wl_rows <= {(171, 193), (0, 193)}


def test_date_from_filename():
    assert date_from_filename('aia.lev1.2012-08-24T00:00:08Z.193.fits') == \
        datetime(2012, 8, 24, 0, 0, 8)
    assert date_from_filename('x_2012-11-01T12:00_y.fits') == \
        datetime(2012, 11, 1, 12, 0)


def test_datasets_and_iteration(tmp_path):
    arr = np.arange(100, dtype=np.float32).reshape(100, 1)
    p = str(tmp_path / 'a.npy')
    np.save(p, arr)
    ds = MmapDataset({'a': p}, batch_size=16)
    assert len(ds) == 7
    batches = list(iterate_batches(ds, epochs=1, shuffle=False))
    assert len(batches) == 6  # ragged final batch dropped
    assert all(b['a'].shape == (16, 1) for b in batches)

    ads = ArrayDataset({'a': arr}, batch_size=30)
    assert len(ads) == 4
    assert ads[3]['a'].shape == (10, 1)


def test_norm_helpers():
    x = np.array([[0.0, 4900.0, 9800.0]])
    np.testing.assert_allclose(normalize(x, 9800.0), [[0, 0.5, 1.0]])
    img = np.arange(16, dtype=np.float32).reshape(1, 4, 4)
    red = block_reduce_mean(img, 2)
    assert red.shape == (1, 2, 2)
    np.testing.assert_allclose(red[0, 0, 0], np.mean([[0, 1], [4, 5]]))
    clipped = percentile_clip(np.array([[-1.0, 0.5, 100.0]]), 10.0)
    assert clipped[0, 0] == 0.0 and clipped[0, 2] < 100.0


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state
    from sunerf_tpu.utils.checkpoint import (latest_checkpoint, load_state,
                                             restore_train_checkpoint,
                                             save_state,
                                             save_train_checkpoint)
    from sunerf_tpu.models.fields import emission_config, init_nerf

    config = emission_config(n_layers=2, d_filter=16)
    params = {'coarse': init_nerf(jax.random.key(0), config),
              'fine': init_nerf(jax.random.key(1), config)}
    opt = make_optimizer()
    state = create_train_state(params, opt)
    state = state._replace(step=state.step + 41)

    wd = str(tmp_path / 'wd')
    save_train_checkpoint(wd, state)
    assert latest_checkpoint(wd).endswith('step_00000041')
    fresh = create_train_state(params, opt)
    restored = restore_train_checkpoint(wd, fresh)
    assert int(restored.step) == 41
    np.testing.assert_array_equal(np.asarray(restored.params['fine']['w_in']),
                                  np.asarray(params['fine']['w_in']))

    # deployment bundle
    save_state(str(tmp_path / 'save_state'), params, {'type': 'emission'})
    loaded, cfg = load_state(str(tmp_path / 'save_state'))
    assert cfg['type'] == 'emission'
    np.testing.assert_array_equal(loaded['coarse']['w_h'],
                                  np.asarray(params['coarse']['w_h']))


def test_plot_data_thumbnails(tmp_path):
    """QA thumbnails (data/plot_data.py, reference preprocessing/plot_data.py):
    block-mean downsample, flat-frame detection, zip archive."""
    from sunerf_tpu.data.fits import write_fits
    from sunerf_tpu.data.plot_data import block_reduce_mean, plot_data

    rng = np.random.default_rng(0)
    good = rng.uniform(0, 1, (32, 32)).astype(np.float32)
    flat = np.full((32, 32), 0.5, np.float32)
    write_fits(str(tmp_path / 'a_good.fits'), good)
    write_fits(str(tmp_path / 'b_flat.fits'), flat)

    out = str(tmp_path / 'thumbs')
    report = plot_data(str(tmp_path / '*.fits'), out, block=8)
    assert report['n_frames'] == 2
    assert report['flat_frames'] == [str(tmp_path / 'b_flat.fits')]
    assert sorted(os.listdir(out)) == ['a_good.fits.jpg', 'b_flat.fits.jpg',
                                       'flat_frames.txt']
    assert os.path.exists(out + '.zip')

    # block reduction is the mean over 8x8 tiles
    np.testing.assert_allclose(
        block_reduce_mean(good, 8),
        good.reshape(4, 8, 4, 8).mean(axis=(1, 3)), rtol=1e-6)
