"""Emission/absorption radiative-transfer head (single wavelength channel).

Physics (reference sunerf/rendering/emission.py:14-54): the field outputs
(log emission, absorption) per sample; pixel intensity is the sum of per-sample
emission attenuated by the exclusive cumulative product of transmission:

  I = sum_i  exp(raw0_i) * dz_i * prod_{j<i} exp(-relu(raw1_j) * dz_j)

The sampling weights for the hierarchical pass are the normalized emerging
intensities.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sunerf_tpu.models.fields import FieldOutput


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """tf.math.cumprod(..., exclusive=True): [1, x0, x0*x1, ...]
    (reference base_tracing.py:135-156)."""
    cp = jnp.cumprod(x, axis=axis)
    ones = jnp.ones_like(jnp.take(cp, jnp.array([0]), axis=axis))
    return jnp.concatenate([ones, jnp.take(cp, jnp.arange(x.shape[axis] - 1), axis=axis)],
                           axis=axis)


def ray_deltas(z_vals: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """Line element dz per sample: consecutive z differences (first repeated)
    scaled by |rays_d| (reference emission.py:24-29)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate([dists[..., :1], dists], axis=-1)
    return dists * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class EmissionHead:
    """Differentiable emission/absorption quadrature.

    Rs_per_ds: solar radii per model distance unit (regularization radius scale).
    """
    Rs_per_ds: float = 1.0
    d_output: int = 2

    def raw2outputs(self, field_out: FieldOutput, z_vals: jnp.ndarray,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    query_points: jnp.ndarray,
                    wavelengths: jnp.ndarray | None = None) -> dict:
        raw = field_out.raw  # [R, S, 2]
        dists = ray_deltas(z_vals, rays_d)  # [R, S]

        intensity = jnp.exp(raw[..., 0]) * dists
        transmission = jnp.exp(-jnp.maximum(raw[..., 1], 0.0) * dists)
        total_absorption = exclusive_cumprod(transmission + 1e-10, axis=-1)

        emerging = intensity * total_absorption
        pixel_intensity = jnp.sum(emerging, axis=-1, keepdims=True)  # [R, 1]
        weights = emerging / (jnp.sum(emerging, axis=-1, keepdims=True) + 1e-10)

        return {'image': pixel_intensity, 'weights': weights,
                'regularizing_quantity': transmission}

    def occupancy_activity(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Per-point scene activity for the occupancy grid (core/occupancy.py):
        emission per unit length plus absorption — absorbing-but-dark regions
        still shape the quadrature and must not be culled."""
        return jnp.exp(raw[..., 0]) + jnp.maximum(raw[..., 1], 0.0)

    def regularization(self, distance: jnp.ndarray,
                       regularizing_quantity: jnp.ndarray) -> jnp.ndarray:
        """Penalize absorption beyond 1.2 Rsun.

        The reference broadcasts [R,S,1] x [R,S] -> [R,S,S] here — an O(S^2)
        memory blow-up bug (base_tracing.py:43-44, SURVEY §2.5-3). This is the
        intended elementwise [R,S] form.
        """
        return jnp.maximum(distance - 1.2 / self.Rs_per_ds, 0.0) * (1.0 - regularizing_quantity)
