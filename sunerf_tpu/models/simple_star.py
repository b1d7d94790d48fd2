"""SimpleStar: analytic hydrostatic stellar atmosphere that pretends to be a
fully trained NeRF (reference sunerf/model/stellar_model.py:5-102).

Used to synthesize training sets and as the closed-loop end-to-end test
backend: render multi-viewpoint images through the DT radiative-transfer head,
train a NeRF on them, verify PSNR climbs (SURVEY §4.3).

Physics (Pascoe et al. 2019, eqs. 4 & 6):
  rho(r) = rho_0                                        r <= 1 Rsun
         = rho_0 * exp((1/r - 1) / h0)                  r >  1 Rsun
  T(r)   = T_phot                                       r <= 1 Rsun
         = linear(T_phot -> T0) on [1, R_s]             1 < r <= R_s
         = T0                                           r >  R_s
Field outputs (log rho, log10 T) in the shared FieldOutput contract.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sunerf_tpu.models.fields import FieldOutput

# 1 solar radius in the length units below
_SOLRAD_CM = 6.957e10  # IAU nominal solar radius [cm]
_SOLRAD_MM = 695.7     # [Mm]


@dataclasses.dataclass(frozen=True)
class SimpleStarConfig:
    """Defaults match the reference (stellar_model.py:8-31): h0 = 60 Mm,
    T0 = 1.4e6 K, R_s = 1.02 Rsun, T_phot = 5777 K, rho_0 = 3e8 cm^-3."""
    h0: float = 60.0 / _SOLRAD_MM          # scale height [Rsun]
    T0: float = 1.4e6                      # coronal temperature [K]
    R_s: float = 1.02                      # isothermal radius [Rsun]
    t_photosphere: float = 5777.0          # photospheric temperature [K]
    rho_0: float = 3.0e8                   # photospheric density [cm^-3]


def init_simple_star(config: SimpleStarConfig = SimpleStarConfig()) -> dict:
    """Param pytree: stellar parameters + per-wavelength log absorption and the
    volumetric constant (all trainable in the reference; stellar_model.py:33-50)."""
    return {
        'Rs': jnp.asarray(config.R_s, jnp.float32),
        'h0': jnp.asarray(config.h0, jnp.float32),
        'T0': jnp.asarray(config.T0, jnp.float32),
        'rho_0': jnp.asarray(config.rho_0, jnp.float32),
        # per-wavelength log absorption for (94, 131, 171, 193, 211, 304, 335) A
        'log_abs': jnp.asarray([20.4, 20.2, 20.0, 19.8, 19.6, 19.4, 19.2], jnp.float32),
        'vol_c': jnp.asarray(1.0, jnp.float32),
    }


def simple_star_apply(config: SimpleStarConfig, params: dict,
                      points: jnp.ndarray) -> FieldOutput:
    """Evaluate (log rho, log10 T) at [N, 4] query points (time is ignored —
    the analytic star is static)."""
    r = jnp.linalg.norm(points[:, :3], axis=-1)
    inside = r <= 1.0

    rho_out = params['rho_0'] * jnp.exp((1.0 / jnp.maximum(r, 1e-6) - 1.0) / params['h0'])
    rho = jnp.where(inside, params['rho_0'], rho_out)
    log_rho = jnp.log(rho)

    t_lin = (r - 1.0) * ((params['T0'] - config.t_photosphere) / (params['Rs'] - 1.0)) \
        + config.t_photosphere
    temp = jnp.where(inside, config.t_photosphere,
                     jnp.where(r <= params['Rs'], t_lin, params['T0']))
    log10_t = jnp.log10(temp)

    raw = jnp.stack([log_rho, log10_t], axis=-1)
    return FieldOutput(raw=raw, log_abs=params['log_abs'], vol_c=params['vol_c'])
