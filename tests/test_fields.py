"""Field model tests: encoding layout, parameter count parity with the
reference MLP (~1.88 M params), init distribution, DT aux params."""
import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.core.encoding import encoded_dim, positional_encoding
from sunerf_tpu.models.fields import (density_temperature_config,
                                      emission_config, init_nerf, nerf_apply,
                                      param_count)
from sunerf_tpu.models.simple_star import (SimpleStarConfig, init_simple_star,
                                           simple_star_apply)


def test_encoding_dims():
    assert encoded_dim(4, 10) == 84
    x = jnp.ones((5, 4))
    enc = positional_encoding(x, n_freqs=10)
    assert enc.shape == (5, 84)


def test_encoding_values():
    """gamma(x) = [x, sin(x * 2^k / 2), cos(x * 2^k / 2)], frequency-major
    (reference model.py:115,127-131)."""
    x = jnp.array([[0.3, -0.7]])
    enc = np.asarray(positional_encoding(x, n_freqs=3))
    assert enc.shape == (1, 2 * (1 + 6))
    np.testing.assert_allclose(enc[0, :2], [0.3, -0.7], atol=1e-6)
    expected_sin = [np.sin(0.3 * f / 2) for f in (1, 2, 4) for _ in (0,)]
    # frequency-major: [sin(f0*x0), sin(f0*x1), sin(f1*x0), ...]
    np.testing.assert_allclose(enc[0, 2], np.sin(0.3 * 0.5), atol=1e-6)
    np.testing.assert_allclose(enc[0, 3], np.sin(-0.7 * 0.5), atol=1e-6)
    np.testing.assert_allclose(enc[0, 4], np.sin(0.3 * 1.0), atol=1e-6)
    np.testing.assert_allclose(enc[0, 8], np.cos(0.3 * 0.5), atol=1e-6)
    del expected_sin


def test_param_count_matches_reference():
    """8x512 Sine MLP with 84-dim encoded input: 1,883,138 params
    (SURVEY §6: ~1.88 M; exact: 84*512+512 + 7*(512^2+512) + 512*2+2)."""
    config = emission_config()
    params = init_nerf(jax.random.key(0), config)
    assert param_count(params) == 1_883_138


def test_nerf_forward_shapes_and_finiteness():
    config = emission_config()
    params = init_nerf(jax.random.key(0), config)
    out = nerf_apply(config, params, jnp.ones((17, 4)))
    assert out.raw.shape == (17, 2)
    assert np.all(np.isfinite(np.asarray(out.raw)))
    assert out.log_abs is None and out.vol_c is None


def test_nerf_init_distribution():
    """torch.nn.Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    config = emission_config()
    params = init_nerf(jax.random.key(1), config)
    w = np.asarray(params['w_h'])
    bound = 1.0 / np.sqrt(512.0)
    assert np.abs(w).max() <= bound + 1e-7
    assert np.abs(w).max() > 0.9 * bound  # actually fills the range


def test_dt_config_offsets_and_aux():
    config = density_temperature_config()
    params = init_nerf(jax.random.key(0), config)
    assert params['log_abs'].shape == (7,)
    out = nerf_apply(config, params, jnp.zeros((4, 4)))
    # base offsets push outputs near (10, 5) for a fresh random init
    raw = np.asarray(out.raw)
    assert np.all(np.abs(raw[:, 0] - 10.0) < 5.0)
    assert np.all(np.abs(raw[:, 1] - 5.0) < 5.0)
    assert out.vol_c is not None


def test_simple_star_physics():
    config = SimpleStarConfig()
    params = init_simple_star(config)
    pts = jnp.array([
        [0.5, 0.0, 0.0, 0.0],   # inside the Sun
        [1.01, 0.0, 0.0, 0.0],  # low corona
        [2.0, 0.0, 0.0, 0.0],   # outer corona
    ])
    out = simple_star_apply(config, params, pts)
    raw = np.asarray(out.raw)
    # inside: rho = rho_0, T = photosphere
    np.testing.assert_allclose(raw[0, 0], np.log(3.0e8), rtol=1e-5)
    np.testing.assert_allclose(raw[0, 1], np.log10(5777.0), rtol=1e-5)
    # far out: isothermal corona
    np.testing.assert_allclose(raw[2, 1], np.log10(1.4e6), rtol=1e-5)
    # density decreases with radius
    assert raw[1, 0] > raw[2, 0]
    # hydrostatic profile value at r=2: rho_0 * exp((1/2 - 1)/h0)
    h0 = 60.0 / 695.7
    np.testing.assert_allclose(raw[2, 0], np.log(3.0e8 * np.exp(-0.5 / h0)), rtol=1e-5)
