"""Evaluation products (volume, synchronic map, eruption profile, uncertainty)
and data-alignment tests, driven over the analytic SimpleStar."""
from datetime import datetime

import numpy as np
import pytest

from sunerf_tpu.evaluation.loader import ModelLoader
from sunerf_tpu.evaluation.products import (eruption_profile, extract_volume,
                                            synchronic_map, topographic_maps,
                                            uncertainty_map)
from sunerf_tpu.systems import make_simple_star_renderer


@pytest.fixture(scope='module')
def star_loader():
    import jax.numpy as jnp
    renderer, init = make_simple_star_renderer(n_stratified=16,
                                               n_hierarchical=16,
                                               perturb=False,
                                               pixel_intensity_factor=1e9)
    params = init()
    params['coarse']['log_abs'] = jnp.zeros(7)
    return ModelLoader(renderer, params, ref_time=datetime(2012, 1, 1),
                       batch_size=512)


def test_extract_volume(star_loader):
    vol = extract_volume(star_loader, time=0.0, resolution=12, extent=1.5)
    raw = vol['raw']
    assert raw.shape == (12, 12, 12, 2)
    # density decreases outward: center voxel denser than corner
    c = raw[6, 6, 6, 0]
    corner = raw[0, 0, 0, 0]
    assert c > corner


def test_synchronic_map(star_loader):
    m = synchronic_map(star_loader, time=0.0, resolution_lat=8,
                       wavelengths=[193.0])
    assert m.shape == (8, 16, 1)
    assert np.all(np.isfinite(m)) and m.max() > 0
    # the analytic star is spherically symmetric: rows roughly uniform
    row = m[4, :, 0]
    assert row.std() / (row.mean() + 1e-12) < 0.1


def test_topographic_maps(star_loader):
    maps = topographic_maps(star_loader, lat=0.0, lon=0.0, time=0.0,
                            distance=215.0, resolution=8, wavelengths=[193.0])
    assert maps['height_map'].shape == (8, 8)
    assert maps['absorption_map'].shape == (8, 8)
    # emission height is near the solar surface for disk-center pixels
    assert 0.8 < maps['height_map'][4, 4] < 1.5


def test_eruption_profile(star_loader):
    prof = eruption_profile(star_loader, times=[0.0, 0.5, 1.0], lat=0.0,
                            lon=0.0, distance=215.0, resolution=8,
                            wavelengths=[193.0])
    assert prof['light_curve'].shape == (3, 1)
    # static star: flat light curve
    lc = prof['light_curve'][:, 0]
    assert np.allclose(lc, lc[0], rtol=1e-4)


def test_uncertainty_map(star_loader):
    u = uncertainty_map(star_loader, lat=0.0, lon=0.0, time=0.0,
                        distance=215.0, resolution=8, wavelengths=[193.0])
    assert u.shape == (8, 8)
    # identical coarse/fine field (same params): tiny but nonzero sampling diff
    assert np.all(np.isfinite(u))


def test_align_directories(tmp_path):
    from sunerf_tpu.data.align import align_directories
    a = tmp_path / 'a'
    b = tmp_path / 'b'
    a.mkdir(); b.mkdir()
    for t in ('2012-01-01T00:00:00', '2012-01-01T06:00:00', '2012-01-01T12:00:00'):
        (a / f'x.{t}.fits').write_bytes(b'0')
    for t in ('2012-01-01T06:00:00', '2012-01-01T12:00:00', '2012-01-01T18:00:00'):
        (b / f'y.{t}.fits').write_bytes(b'0')
    aligned = align_directories([str(a), str(b)], str(tmp_path / 'out'))
    assert len(aligned) == 2
    assert (tmp_path / 'out' / 'a').exists() and (tmp_path / 'out' / 'b').exists()


def test_trainable_encoding():
    import jax.numpy as jnp
    from sunerf_tpu.core.encoding import (init_trainable_encoding,
                                          trainable_encoding_apply)
    params = init_trainable_encoding(4, n_freqs=5)
    assert params['frequencies'].shape == (5, 4)
    out = trainable_encoding_apply(params, jnp.ones((3, 4)))
    assert out.shape == (3, 40)
    assert np.all(np.isfinite(np.asarray(out)))
