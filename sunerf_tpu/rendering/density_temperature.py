"""Density-temperature radiative-transfer head (all 7 AIA channels at once).

Physics (reference sunerf/rendering/density_temperature.py:192-271): the field
outputs (log density, log10 temperature); per-wavelength intensity is

  I_wl = vol_c * pif * trapz( exp(-cumtrapz(rho * kappa_wl, z)) * rho^2 * R_wl(logT), z )

with rho = exp(relu(raw0)), logT = relu(raw1), kappa_wl = relu(log_abs[wl]) and
R_wl the AIA temperature-response function. The quadrature runs over the sample
axis with trapezoid rules; hierarchical sampling weights are normalized
relu(density).

TPU-native difference from the reference: the per-unique-wavelength Python loop
with host syncs (density_temperature.py:245-256) is replaced by a one-hot
channel contraction (see ops/tresp.py) — everything stays on device inside one
jit region. The reference also converts dz to cm (density_temperature.py:231-232)
but never uses the result (dead code); integrals use raw z_vals in model units,
compensated by pixel_intensity_factor, and we match that.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sunerf_tpu.models.fields import FieldOutput
from sunerf_tpu.ops.tresp import TemperatureResponse


def cumtrapz(y: jnp.ndarray, x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Cumulative trapezoid of y over x along the sample axis.
    y: [R, S, W], x: [R, S] -> [R, S-1, W]."""
    assert axis == 1
    dx = (x[:, 1:] - x[:, :-1])[..., None]
    seg = 0.5 * (y[:, 1:] + y[:, :-1]) * dx
    return jnp.cumsum(seg, axis=1)


def trapz(y: jnp.ndarray, x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Trapezoid integral of y over x along the sample axis.
    y: [R, S, W], x: [R, S] -> [R, W]."""
    assert axis == 1
    dx = (x[:, 1:] - x[:, :-1])[..., None]
    return jnp.sum(0.5 * (y[:, 1:] + y[:, :-1]) * dx, axis=1)


@dataclasses.dataclass(frozen=True, eq=False)
class DensityTemperatureHead:
    """Multi-channel EUV synthesis through AIA temperature responses.

    response: shared-grid response table (ops/tresp.py).
    pixel_intensity_factor: output scale (reference default 1e10 in the
        renderer, 1e17 via the Lightning module; sunerf.py:155).
    Rs_per_ds: solar radii per model distance unit.
    """
    response: TemperatureResponse
    pixel_intensity_factor: float = 1e10
    Rs_per_ds: float = 1.0
    d_output: int = 2
    # hierarchical-resampling weights: 'density' is reference parity
    # (relu(log density), density_temperature.py:266-268 — nearly uniform
    # along the ray when the log-density is smooth); 'emission' weights by the
    # attenuated integrand itself (rho^2 * response * transmission, summed
    # over channels), placing fine samples where the pixel value actually
    # forms. Opt-in quality improvement (ROADMAP 8), identical image math.
    hierarchical_weighting: str = 'density'

    def raw2outputs(self, field_out: FieldOutput, z_vals: jnp.ndarray,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    query_points: jnp.ndarray,
                    wavelengths: jnp.ndarray) -> dict:
        """
        Args:
            field_out: raw [R, S, 2] + log_abs [C] + vol_c scalar.
            z_vals: [R, S] sample positions along rays (model units).
            wavelengths: [R, W] wavelength values (0 = channel absent for this ray).
        Returns:
            image [R, W], weights [R, S], regularizing_quantity [R, S].
        """
        raw = field_out.raw
        density = jnp.exp(jnp.maximum(raw[..., 0], 0.0))       # [R, S]
        log_t = jnp.maximum(raw[..., 1], 0.0)                  # [R, S]

        onehot = self.response.channel_onehot(wavelengths)     # [R, W, C]
        per_ch = self.response.evaluate_channels_last(log_t)   # [R, S, C]
        t_resp = jnp.einsum('rwc,rsc->rsw', onehot, per_ch)    # [R, S, W]

        abs_coeff = onehot @ jnp.maximum(field_out.log_abs, 0.0)  # [R, W]

        absorption = density[..., None] * abs_coeff[:, None, :]   # [R, S, W]
        absorption_integral = cumtrapz(absorption, z_vals)         # [R, S-1, W]

        emission = (density ** 2)[..., None] * t_resp              # [R, S, W]
        integrand = jnp.exp(-absorption_integral) * emission[:, :-1]
        image = trapz(integrand, z_vals[:, :-1]) * field_out.vol_c \
            * self.pixel_intensity_factor                          # [R, W]

        if self.hierarchical_weighting == 'emission':
            # the integrand the image integral actually sums (channel-summed,
            # transmission-attenuated) — sample where the light comes from.
            # Scale by the per-ray max first: absolute integrand values are
            # ~1e-17 (AIA response units), far below the 1e-10 epsilon.
            w = jnp.sum(integrand, axis=-1)                     # [R, S-1]
            w = w / (jnp.max(w, axis=1, keepdims=True) + 1e-30)
            w = jnp.concatenate([w, w[:, -1:]], axis=1)         # pad to [R, S]
        else:
            w = jnp.maximum(raw[..., 0], 0.0)
        weights = w / (jnp.sum(w, axis=1, keepdims=True) + 1e-10)

        return {'image': image, 'weights': weights,
                'regularizing_quantity': jnp.maximum(raw[..., 0], 0.0)}

    def occupancy_activity(self, raw: jnp.ndarray) -> jnp.ndarray:
        """EUV emission scales with density squared (the rho^2 in the
        quadrature above), so the occupancy criterion follows it."""
        return jnp.exp(2.0 * jnp.maximum(raw[..., 0], 0.0))

    def regularization(self, distance: jnp.ndarray,
                       regularizing_quantity: jnp.ndarray) -> jnp.ndarray:
        """Penalize density beyond 1.25 Rsun (density_temperature.py:273-274)."""
        return jnp.maximum(distance - 1.25 / self.Rs_per_ds, 0.0) \
            * jnp.maximum(regularizing_quantity, 0.0)
