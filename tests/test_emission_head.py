"""Emission radiative-transfer quadrature: golden values against the closed
form for constant emission/absorption (reference emission.py:14-54)."""
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.models.fields import FieldOutput
from sunerf_tpu.rendering.emission import (EmissionHead, exclusive_cumprod,
                                           ray_deltas)


def test_exclusive_cumprod():
    x = jnp.array([[2.0, 3.0, 4.0]])
    out = np.asarray(exclusive_cumprod(x))
    np.testing.assert_allclose(out, [[1.0, 2.0, 6.0]], atol=1e-6)


def test_ray_deltas_first_repeated_and_direction_norm():
    z = jnp.array([[1.0, 1.5, 2.5]])
    d = jnp.array([[0.0, 2.0, 0.0]])  # norm 2
    out = np.asarray(ray_deltas(z, d))
    np.testing.assert_allclose(out, [[1.0, 1.0, 2.0]], atol=1e-6)


def _run_head(raw, z, d=None):
    head = EmissionHead()
    r, s = raw.shape[:2]
    if d is None:
        d = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (r, 1))
    o = jnp.zeros((r, 3))
    q = jnp.zeros((r, s, 3))
    return head.raw2outputs(FieldOutput(raw=raw), z, o, d, q)


def test_no_absorption_sums_emission():
    """kappa=0 -> I = sum(exp(raw0) * dz) (total_absorption == 1 everywhere)."""
    S = 8
    z = jnp.linspace(0.0, 1.0, S)[None, :]
    raw = jnp.stack([jnp.full((1, S), 0.5), jnp.full((1, S), -1.0)], axis=-1)
    out = _run_head(raw, z)
    dz = 1.0 / (S - 1)
    expected = np.exp(0.5) * dz * S  # first delta repeated -> S equal segments
    np.testing.assert_allclose(np.asarray(out['image'])[0, 0], expected, rtol=1e-4)


def test_constant_absorption_matches_analytic():
    """Constant emission eps and absorption kappa along a ray of length L:
    I = eps * (1 - exp(-kappa L)) / kappa (midpoint-rule discretization
    converges to this as S grows)."""
    S, L, eps_log, kappa = 512, 2.0, 1.2, 3.0
    z = jnp.linspace(0.0, L, S)[None, :]
    raw = jnp.stack([jnp.full((1, S), eps_log), jnp.full((1, S), kappa)], axis=-1)
    out = _run_head(raw, z)
    analytic = np.exp(eps_log) * (1 - np.exp(-kappa * L)) / kappa
    np.testing.assert_allclose(np.asarray(out['image'])[0, 0], analytic, rtol=2e-2)


def test_weights_normalized():
    S = 16
    z = jnp.linspace(1.0, 3.0, S)[None, :]
    raw = jnp.stack([jnp.ones((1, S)), jnp.ones((1, S)) * 0.3], axis=-1)
    out = _run_head(raw, z)
    np.testing.assert_allclose(np.asarray(out['weights']).sum(-1), 1.0, rtol=1e-5)


def test_regularization_elementwise_shape():
    """The fixed regularizer is elementwise [R, S], not the reference's
    broadcast-bugged [R, S, S] (SURVEY §2.5-3)."""
    head = EmissionHead()
    distance = jnp.ones((4, 8)) * 2.0
    reg_q = jnp.zeros((4, 8))
    reg = head.regularization(distance, reg_q)
    assert reg.shape == (4, 8)
    np.testing.assert_allclose(np.asarray(reg), 0.8, rtol=1e-5)
    # inside 1.2 Rsun: no penalty
    reg_in = head.regularization(jnp.ones((4, 8)), reg_q)
    np.testing.assert_allclose(np.asarray(reg_in), 0.0, atol=1e-7)
