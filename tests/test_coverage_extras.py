"""Coverage for less-traveled corners: rotated WCS, integer FITS, the
spherical-sampler renderer path, custom FOV renders, and the public API."""
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.data.fits import Header, read_fits, write_fits
from sunerf_tpu.data.wcs import helioprojective_grid, observer_header


def test_public_api_lazy_exports():
    import sunerf_tpu
    assert callable(sunerf_tpu.make_emission_system)
    assert callable(sunerf_tpu.SuNeRFLoader)
    try:
        sunerf_tpu.not_a_thing
        assert False
    except AttributeError:
        pass


def test_wcs_crota2_rotation():
    """A 90-deg CROTA2 swaps the Tx/Ty axes (up to sign)."""
    header = Header()
    header.update(observer_header(0.0, 0.0, 215.0, datetime(2012, 1, 1),
                                  9, 193.0))
    tx0, ty0 = helioprojective_grid(header, shape=(9, 9))
    header['CROTA2'] = 90.0
    tx90, ty90 = helioprojective_grid(header, shape=(9, 9))
    # PC(90 deg) = [[0,-1],[1,0]] (square pixels): Tx' = -Ty, Ty' = Tx
    np.testing.assert_allclose(tx90, -ty0, atol=1e-9)
    np.testing.assert_allclose(ty90, tx0, atol=1e-9)


def test_fits_int16_with_bzero(tmp_path):
    """Unsigned 16-bit data stored as int16 + BZERO (the common AIA raw
    layout) reads back as physical values."""
    import struct
    # hand-craft a minimal BITPIX=16 file with BSCALE/BZERO
    path = str(tmp_path / 'u16.fits')
    cards = []

    def card(k, v):
        if isinstance(v, bool):
            return f'{k:<8}= {"T" if v else "F":>20}'.ljust(80)
        return f'{k:<8}= {v:>20}'.ljust(80)

    cards += [card('SIMPLE', True), card('BITPIX', 16), card('NAXIS', 2),
              card('NAXIS1', 4), card('NAXIS2', 2), card('BZERO', 32768),
              card('BSCALE', 1), 'END'.ljust(80)]
    header_bytes = ''.join(cards).encode()
    header_bytes += b' ' * (-len(header_bytes) % 2880)
    vals = np.array([[0, 1, 2, 3], [4, 5, 6, 7]], dtype='>i2')
    data_bytes = vals.tobytes()
    data_bytes += b'\0' * (-len(data_bytes) % 2880)
    with open(path, 'wb') as f:
        f.write(header_bytes + data_bytes)
    data, header = read_fits(path)
    np.testing.assert_allclose(data, vals.astype(np.float64) + 32768)


def test_renderer_spherical_sampling():
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=16),
        sampling='spherical', sample_distance=2.0,
        n_stratified=8, n_hierarchical=8)
    params = init(jax.random.key(0))
    o = jnp.array([[4.0, 0.0, 0.0]])
    d = jnp.array([[-1.0, 0.0, 0.0]])
    out = jax.jit(lambda p: renderer(p, o, d, jnp.zeros((1, 1)), key=None))(params)
    z = np.asarray(out['z_vals_stratified'])
    # spherical sampler: enters the 2-Rsun bounding sphere at t=2
    assert abs(z[0, 0] - 2.0) < 1e-4
    assert np.all(np.isfinite(np.asarray(out['image'])))


def test_render_with_custom_fov():
    from sunerf_tpu.evaluation.loader import ModelLoader
    from sunerf_tpu.systems import make_simple_star_renderer
    renderer, init = make_simple_star_renderer(n_stratified=8,
                                               n_hierarchical=8, perturb=False)
    params = init()
    params['coarse']['log_abs'] = jnp.zeros(7)
    loader = ModelLoader(renderer, params, batch_size=256)
    wide = loader.render_observer_image(0.0, 0.0, 0.0, 215.0, resolution=8,
                                        wavelengths=[193.0])
    narrow = loader.render_observer_image(0.0, 0.0, 0.0, 215.0, resolution=8,
                                          wavelengths=[193.0],
                                          fov=2 * np.arctan2(0.5, 215.0))
    # narrow FOV looks only at the disk: every pixel bright
    assert narrow.image.min() > wide.image.min()


def test_fits_write_rejects_bad_dtype(tmp_path):
    try:
        write_fits(str(tmp_path / 'x.fits'), np.zeros((2, 2), dtype=complex))
        assert False
    except TypeError:
        pass


def test_download_cli_subcommand_wiring(tmp_path):
    """The download CLI parses every subcommand and routes to the gated
    implementation (network deps absent here, so reaching the documented
    ImportError / empty-alignment path proves the wiring)."""
    import pytest

    from sunerf_tpu.data import download

    with pytest.raises(ImportError, match='drms'):
        download.main(['synoptic', '--carrington-rotation', '2150',
                       '--out', str(tmp_path)])
    # empty data dir -> no aligned basenames -> clean no-op before the ITI
    # model would be needed
    download.main(['stereo-to-sdo', '--data-path', str(tmp_path),
                   '--out', str(tmp_path / 'out')])


def test_stereo_to_sdo_conversion_contract(tmp_path):
    """convert_stereo_to_sdo: aligns basenames across the four SECCHI
    wavelength dirs, passes per-wavelength path lists to the translator, and
    writes AIA-like outputs to out/<sdo_wl>/<basename> (reference
    convert_stereo_to_sdo.py:52-128) — exercised with a fake translator."""
    import os

    from sunerf_tpu.data.download import (SDO_TARGET_WAVELENGTHS,
                                          align_stereo_basenames,
                                          convert_stereo_to_sdo)

    data = tmp_path / 'prep'
    names = ['a_2012-08-01T00:00:00.fits', 'b_2012-08-01T06:00:00.fits',
             'c_2012-08-01T12:00:00.fits']
    for wl in ('171', '195', '284', '304'):
        d = data / wl
        d.mkdir(parents=True)
        # 'c' missing from 284: must be dropped by the alignment
        for n in names if wl != '284' else names[:2]:
            (d / n).write_bytes(b'')

    out = tmp_path / 'converted'
    assert align_stereo_basenames(str(data)) == names[:2]

    class FakeMap:
        def save(self, path):
            with open(path, 'w') as f:
                f.write('x')

    calls = {}

    class FakeTranslator:
        def translate(self, paths, basenames=None):
            calls['paths'] = paths
            calls['basenames'] = basenames
            for _ in basenames:
                yield [FakeMap() for _ in range(4)]

    written = convert_stereo_to_sdo(str(data), str(out),
                                    translator=FakeTranslator())
    assert calls['basenames'] == names[:2]
    assert len(calls['paths']) == 4
    assert calls['paths'][1][0].endswith(os.path.join('195', names[0]))
    assert len(written) == 8
    for wl in SDO_TARGET_WAVELENGTHS:
        for n in names[:2]:
            assert os.path.exists(out / str(wl) / n)

    # resumable: everything already converted -> nothing to do, and the
    # default (dependency-gated) translator is never constructed
    assert convert_stereo_to_sdo(str(data), str(out)) == []


def test_effective_rate_windowing():
    """Throughput accounting (utils/throughput.py): compile windows dropped
    per phase, remaining windows combined as a ray-weighted harmonic mean —
    the semantics behind every mixed-budget rays/s number in RESULTS.md."""
    import pytest

    from sunerf_tpu.utils.throughput import effective_rate

    # single phase: first window (compile) dropped, equal windows -> plain
    # harmonic mean of the rest
    samples = [(10, 1.0), (20, 100.0), (30, 200.0)]
    rate = effective_rate(samples)
    assert rate == pytest.approx(2 / (1 / 100 + 1 / 200))

    # two phases: the window containing the phase start is dropped too, and
    # unequal window lengths are ray-weighted
    samples = [(10, 1.0), (20, 100.0), (30, 100.0),   # phase 1 (starts 0)
               (45, 1.0), (65, 300.0)]                # phase 2 (starts 30)
    rate = effective_rate(samples, phase_starts=(0, 30))
    # kept: (10, 100), (10, 100) from phase 1 and (20, 300) from phase 2
    assert rate == pytest.approx((10 + 10 + 20) / (10 / 100 + 10 / 100 + 20 / 300))

    # order-independent
    assert effective_rate(reversed(samples), phase_starts=(0, 30)) == rate

    with pytest.raises(ValueError):
        effective_rate([(10, 50.0)])  # only the compile window exists


def test_vm_grid_fallback_warns_loudly():
    """grid_rank/grid_time tables run the XLA field path, not the fused
    kernel — the fallback must WARN so step-rate comparisons against fused
    configs are never silently apples-to-oranges (VERDICT r3 weak #5)."""
    import warnings

    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import _select_apply

    vm_cfg = emission_config(n_layers=2, d_filter=32,
                             grid_sizes=(8,), grid_rank=4)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        fn = _select_apply(vm_cfg, True)   # use_fused requested
    assert any('XLA field path' in str(w.message) for w in caught)
    assert fn.func.__name__ == 'nerf_apply'

    # dense tables stay in the fused path, silently
    dense_cfg = emission_config(n_layers=2, d_filter=32, grid_sizes=(8,))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        fn = _select_apply(dense_cfg, True)
    assert not caught
    assert fn.func.__name__ == 'nerf_apply_fused'
