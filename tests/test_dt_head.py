"""Density-temperature head tests: response lookup, channel masking, trapezoid
quadrature golden values (reference density_temperature.py:192-271)."""
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.models.fields import FieldOutput
from sunerf_tpu.ops.tresp import TemperatureResponse, load_aia_response
from sunerf_tpu.rendering.density_temperature import (DensityTemperatureHead,
                                                      cumtrapz, trapz)


def _toy_response():
    """Analytically simple response: R_c(logT) = (c+1) * logT on [0, 10]."""
    logte = jnp.linspace(0.0, 10.0, 11)
    tresp = jnp.stack([(c + 1.0) * logte for c in range(7)])
    return TemperatureResponse(logte=logte, tresp=tresp)


def test_cumtrapz_and_trapz():
    x = jnp.array([[0.0, 1.0, 3.0]])
    y = jnp.array([[[1.0], [3.0], [5.0]]])  # [1, 3, 1]
    ct = np.asarray(cumtrapz(y, x))
    np.testing.assert_allclose(ct[0, :, 0], [2.0, 10.0], atol=1e-6)
    t = np.asarray(trapz(y, x))
    np.testing.assert_allclose(t[0, 0], 10.0, atol=1e-6)


def test_real_response_loads_and_interpolates():
    r = load_aia_response()
    assert r.logte.shape == (101,) and r.tresp.shape == (7, 101)
    vals = np.asarray(r.evaluate_all(jnp.array([6.0])))
    assert vals.shape == (7, 1)
    assert np.all(vals > 0)  # every channel responds at 1 MK
    # extrapolation is zero outside the table
    out = np.asarray(r.evaluate_all(jnp.array([3.0, 9.9])))
    np.testing.assert_allclose(out, 0.0, atol=1e-30)
    # 171 A (index 2) peaks near logT ~ 5.9
    peak_t = np.asarray(r.logte)[np.argmax(np.asarray(r.tresp)[2])]
    assert 5.5 < peak_t < 6.2


def test_channel_masking_zeroes_missing_wavelengths():
    head = DensityTemperatureHead(response=_toy_response(),
                                  pixel_intensity_factor=1.0)
    R, S = 2, 8
    raw = jnp.stack([jnp.full((R, S), 1.0), jnp.full((R, S), 5.0)], axis=-1)
    field_out = FieldOutput(raw=raw, log_abs=jnp.zeros(7), vol_c=jnp.asarray(1.0))
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S), (R, S))
    wl = jnp.array([[94.0, 193.0], [94.0, 0.0]])  # ray 1 lacks channel 2
    out = head.raw2outputs(field_out, z, jnp.zeros((R, 3)),
                           jnp.ones((R, 3)), jnp.zeros((R, S, 3)), wl)
    img = np.asarray(out['image'])
    assert img.shape == (2, 2)
    assert img[1, 1] == 0.0          # masked channel renders zero
    assert img[0, 0] == img[1, 0]    # shared channel identical across rays
    assert img[0, 1] > img[0, 0]     # toy response scales with channel index


def test_dt_quadrature_golden():
    """Constant density rho and zero absorption: I = rho^2 * R(logT) * L * pif."""
    head = DensityTemperatureHead(response=_toy_response(),
                                  pixel_intensity_factor=2.0)
    R, S, L = 1, 64, 3.0
    log_rho, log_t = 1.0, 5.0
    raw = jnp.stack([jnp.full((R, S), log_rho), jnp.full((R, S), log_t)], axis=-1)
    field_out = FieldOutput(raw=raw, log_abs=jnp.zeros(7), vol_c=jnp.asarray(1.5))
    z = jnp.linspace(0.0, L, S)[None, :]
    wl = jnp.array([[94.0]])
    out = head.raw2outputs(field_out, z, jnp.zeros((R, 3)),
                           jnp.ones((R, 3)), jnp.zeros((R, S, 3)), wl)
    rho = np.exp(log_rho)
    resp = 1.0 * log_t  # channel 0 toy response at logT=5
    # integration runs over z[:, :-1] (S-1 points), matching the reference
    length = L * (S - 2) / (S - 1)
    expected = rho ** 2 * resp * length * 1.5 * 2.0
    np.testing.assert_allclose(np.asarray(out['image'])[0, 0], expected, rtol=1e-5)


def test_dt_absorption_attenuates():
    head = DensityTemperatureHead(response=_toy_response(),
                                  pixel_intensity_factor=1.0)
    R, S = 1, 64
    raw = jnp.stack([jnp.full((R, S), 1.0), jnp.full((R, S), 5.0)], axis=-1)
    z = jnp.linspace(0.0, 3.0, S)[None, :]
    wl = jnp.array([[94.0]])
    args = (z, jnp.zeros((R, 3)), jnp.ones((R, 3)), jnp.zeros((R, S, 3)), wl)
    free = head.raw2outputs(FieldOutput(raw=raw, log_abs=jnp.zeros(7),
                                        vol_c=jnp.asarray(1.0)), *args)
    absorbed = head.raw2outputs(FieldOutput(raw=raw, log_abs=jnp.full(7, 0.5),
                                            vol_c=jnp.asarray(1.0)), *args)
    assert np.asarray(absorbed['image'])[0, 0] < np.asarray(free['image'])[0, 0]


def test_dt_regularization():
    head = DensityTemperatureHead(response=_toy_response())
    reg = head.regularization(jnp.full((2, 4), 2.0), jnp.full((2, 4), 3.0))
    np.testing.assert_allclose(np.asarray(reg), 0.75 * 3.0, rtol=1e-5)


def test_emission_weighted_hierarchical_sampling():
    """hierarchical_weighting='emission' (ROADMAP 8, opt-in): fine-sampling
    weights follow the attenuated integrand instead of relu(log density) —
    identical image, different (sharper) weights."""
    import jax
    import jax.numpy as jnp

    from sunerf_tpu.models.fields import FieldOutput
    from sunerf_tpu.ops.tresp import load_aia_response
    from sunerf_tpu.rendering.density_temperature import DensityTemperatureHead

    resp = load_aia_response()
    R, S = 4, 16
    key = jax.random.key(0)
    # density bump in the middle of the ray, constant log T
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S), (R, S))
    raw0 = 1.0 + 4.0 * jnp.exp(-((z - 0.5) / 0.08) ** 2)
    raw = jnp.stack([raw0, jnp.full((R, S), 6.0)], axis=-1)
    fo = FieldOutput(raw=raw, log_abs=jnp.full((7,), 0.1), vol_c=jnp.asarray(1.0))
    rays_o = jnp.zeros((R, 3)).at[:, 0].set(4.0)
    rays_d = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (R, 1))
    wl = jnp.broadcast_to(jnp.asarray([193.0]), (R, 1))
    qp = jnp.zeros((R, S, 3))

    base = DensityTemperatureHead(response=resp)
    emis = DensityTemperatureHead(response=resp,
                                  hierarchical_weighting='emission')
    out_b = base.raw2outputs(fo, z, rays_o, rays_d, qp, wl)
    out_e = emis.raw2outputs(fo, z, rays_o, rays_d, qp, wl)

    # image math identical
    np.testing.assert_allclose(np.asarray(out_b['image']),
                               np.asarray(out_e['image']), rtol=1e-6)
    wb, we = np.asarray(out_b['weights']), np.asarray(out_e['weights'])
    np.testing.assert_allclose(wb.sum(-1), 1.0, rtol=1e-4)
    np.testing.assert_allclose(we.sum(-1), 1.0, rtol=1e-4)
    # emission weights concentrate at the bump far harder than the nearly
    # uniform density weights (rho^2 vs log rho)
    assert we.max() > 2.0 * wb.max()
    assert abs(we[0].argmax() - S // 2) <= 1


def test_dt_system_spec_roundtrip_weighting():
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import from_spec, make_density_temperature_system

    renderer, _ = make_density_temperature_system(
        model_config=density_temperature_config(n_layers=2, d_filter=32,
                                                n_freqs=3),
        use_fused=False, hierarchical_weighting='emission')
    assert renderer.spec['hierarchical_weighting'] == 'emission'
    r2, _ = from_spec(renderer.spec, use_fused=False)
    assert r2.head.hierarchical_weighting == 'emission'


def test_dt_proposal_coarse_field():
    """DT system with a small proposal-style coarse field: coarse params take
    the small shape, forward runs, spec round-trips."""
    import jax
    import jax.numpy as jnp

    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import from_spec, make_density_temperature_system

    fine = density_temperature_config(n_layers=3, d_filter=64, n_freqs=4)
    coarse = density_temperature_config(n_layers=2, d_filter=16, n_freqs=4)
    renderer, init = make_density_temperature_system(
        model_config=fine, coarse_config=coarse, use_fused=False,
        n_stratified=8, n_hierarchical=8)
    params = init(jax.random.key(0))
    assert params['coarse']['w_h'].shape == (1, 16, 16)
    assert params['fine']['w_h'].shape == (2, 64, 64)

    n = 8
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[-1.0, 0.0, 0.0]]), (n, 1))
    wl = jnp.broadcast_to(jnp.array([171.0, 193.0]), (n, 2))
    out = renderer(params, rays_o, rays_d, jnp.zeros((n, 1)), wavelengths=wl)
    assert out['image'].shape == (n, 2)
    assert bool(jnp.all(jnp.isfinite(out['image'])))

    r2, init2 = from_spec(renderer.spec, use_fused=False)
    assert init2(jax.random.key(0))['coarse']['w_h'].shape == (1, 16, 16)
    assert r2.coarse_field_apply is not None


def test_dt_default_pif_gives_liftoff_scale_init():
    """The reference module's pixel_intensity_factor=1e17 (sunerf.py:155) is
    load-bearing for optimization, not just units: the DT head is
    multiplicative (image ~ exp(2 log_rho) * R(log_T) * pif), so gradient
    magnitude tracks prediction magnitude. At the base init (log_rho=10,
    log_T=5) the default pif must land init predictions within a few orders
    of AIA-DN-scale targets (O(1-1e2)); at the 1e9 generation pif they are
    ~1e-10 and training collapses to the zero-prediction score (RESULTS.md
    round-3 DT ablation). Guards the default against rescaling."""
    import jax
    import jax.numpy as jnp

    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import make_density_temperature_system

    mc = density_temperature_config(n_layers=2, d_filter=32, n_freqs=3)
    n = 32
    key = jax.random.key(3)
    rays_o = jnp.tile(jnp.array([[215.0, 0.0, 0.0]]), (n, 1))
    d = -rays_o + 0.8 * jax.random.normal(key, (n, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    wl = jnp.broadcast_to(jnp.array([171.0, 193.0, 211.0, 304.0]), (n, 4))

    def init_pred_absmax(pif):
        renderer, init = make_density_temperature_system(
            model_config=mc, use_fused=False, pixel_intensity_factor=pif,
            n_stratified=16, n_hierarchical=16)
        params = init(jax.random.key(0))
        out = renderer(params, rays_o, rays_d, jnp.zeros((n, 1)),
                       wavelengths=wl)
        return float(jnp.abs(out['image']).max())

    default = init_pred_absmax(1e17)    # the factory default
    gen_scale = init_pred_absmax(1e9)   # the synthetic-generation scale
    assert 1e-2 < default < 1e5, default       # alive at target scale
    assert gen_scale < 1e-5, gen_scale         # provably dead at 1e9
    assert abs(default / gen_scale - 1e8) / 1e8 < 1e-3  # pure scale factor


def test_degenerate_prediction_sentinel():
    """validate()'s zero-output sentinel: fires on a collapsed prediction,
    stays quiet on a live one (and on an all-zero target)."""
    import numpy as np

    from sunerf_tpu.train.loop import degenerate_prediction

    target = np.array([[3.0, 50.0], [0.2, 7.0]])
    assert degenerate_prediction(np.zeros_like(target), target)
    assert degenerate_prediction(np.full_like(target, 1e-9), target)
    assert not degenerate_prediction(np.full_like(target, 0.5), target)
    # all-zero target: nothing to collapse against; must not divide by zero
    assert not degenerate_prediction(np.full_like(target, 0.5),
                                     np.zeros_like(target))
