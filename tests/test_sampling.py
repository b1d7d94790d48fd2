"""Sampler unit tests: ray-sphere clipping, bin jitter bounds, inverse-CDF
statistics (reference sunerf/train/sampling.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.core.sampling import (hierarchical_sample, sample_pdf,
                                      spherical_sample, stratified_sample)


def _head_on_rays():
    """One ray hitting the Sun dead-center from x=+4, one missing entirely."""
    rays_o = jnp.array([[4.0, 0.0, 0.0], [4.0, 3.0, 0.0]])
    rays_d = jnp.array([[-1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    return rays_o, rays_d


def test_stratified_near_far():
    rays_o, rays_d = _head_on_rays()
    out = stratified_sample(rays_o, rays_d, n_samples=16, distance=1.3)
    z = np.asarray(out['z_vals'])
    # hit ray: near = |o| - 1.3, far clipped at solar surface (x=+1 -> t=3)
    assert np.isclose(z[0, 0], 4.0 - 1.3, atol=1e-5)
    assert np.isclose(z[0, -1], 3.0, atol=1e-5)
    # miss ray: |o| = 5, near/far = 5 -/+ 1.3
    assert np.isclose(z[1, 0], 5.0 - 1.3, atol=1e-5)
    assert np.isclose(z[1, -1], 5.0 + 1.3, atol=1e-5)
    assert np.all(np.diff(z, axis=-1) > 0)


def test_stratified_points_on_ray():
    rays_o, rays_d = _head_on_rays()
    out = stratified_sample(rays_o, rays_d, n_samples=8)
    pts = np.asarray(out['points'])
    z = np.asarray(out['z_vals'])
    expected = np.asarray(rays_o)[:, None] + np.asarray(rays_d)[:, None] * z[..., None]
    np.testing.assert_allclose(pts, expected, atol=1e-6)


def test_stratified_perturb_stays_in_bins():
    rays_o, rays_d = _head_on_rays()
    base = stratified_sample(rays_o, rays_d, n_samples=32)['z_vals']
    pert = stratified_sample(rays_o, rays_d, n_samples=32,
                             key=jax.random.key(0))['z_vals']
    base, pert = np.asarray(base), np.asarray(pert)
    assert not np.allclose(base, pert)
    # jittered samples stay within their bin (between neighboring midpoints)
    mids = 0.5 * (base[:, 1:] + base[:, :-1])
    lower = np.concatenate([base[:, :1], mids], axis=1)
    upper = np.concatenate([mids, base[:, -1:]], axis=1)
    assert np.all(pert >= lower - 1e-6) and np.all(pert <= upper + 1e-6)


def test_spherical_sampler_bounds():
    rays_o, rays_d = _head_on_rays()
    out = spherical_sample(rays_o, rays_d, n_samples=16, distance=2.0)
    z = np.asarray(out['z_vals'])
    # hit ray: enters the 2-Rsun sphere at t=2, stops at the solar surface t=3
    assert np.isclose(z[0, 0], 2.0, atol=1e-5)
    assert np.isclose(z[0, -1], 3.0, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    """Samples should land where the weights are."""
    bins = jnp.linspace(0.0, 1.0, 11)[None, :].repeat(2, axis=0)  # [2, 11]
    weights = jnp.zeros((2, 10)).at[:, 7].set(1.0)  # all mass in bin 7
    samples = np.asarray(sample_pdf(bins, weights, n_samples=64))
    # nearly all samples inside [bins[7], bins[8]] = [0.7, 0.8]
    frac = np.mean((samples >= 0.65) & (samples <= 0.85))
    assert frac > 0.9


def test_sample_pdf_uniform_weights_cover_range():
    bins = jnp.linspace(2.0, 3.0, 9)[None, :]
    weights = jnp.ones((1, 8))
    samples = np.asarray(sample_pdf(bins, weights, n_samples=128,
                                    key=jax.random.key(1)))
    assert samples.min() >= 2.0 - 1e-5 and samples.max() <= 3.0 + 1e-5
    assert np.std(samples) > 0.2  # roughly spread over the range


def test_hierarchical_output_sorted_and_counts():
    rays_o, rays_d = _head_on_rays()
    strat = stratified_sample(rays_o, rays_d, n_samples=16)
    weights = jnp.ones_like(strat['z_vals'])
    out = hierarchical_sample(rays_o, rays_d, strat['z_vals'], weights,
                              n_samples=32)
    z = np.asarray(out['z_vals'])
    assert z.shape == (2, 48)
    assert np.all(np.diff(z, axis=-1) >= 0)
    assert out['new_z_samples'].shape == (2, 32)


def test_hierarchical_no_gradient_through_new_samples():
    rays_o, rays_d = _head_on_rays()

    def f(w):
        strat = stratified_sample(rays_o, rays_d, n_samples=16)
        out = hierarchical_sample(rays_o, rays_d, strat['z_vals'], w, n_samples=8)
        return jnp.sum(out['new_z_samples'])

    g = jax.grad(f)(jnp.ones((2, 16)))
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)
