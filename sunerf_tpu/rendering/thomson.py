"""Thomson-scattering head for white-light (coronagraph) total and polarized
brightness.

Physics (Howard & Tappin 2009, eqs. 23/24/29; reference
sunerf/rendering/thompson.py:7-109): the field outputs log10 electron density;
per-sample scattering intensities use the geometric coefficient functions
A, B, C, D of the half-angular solar width omega, with limb-darkening u=0.63.

The reference never wires this head to an entry point (orphaned); here it is a
first-class head usable with the shared renderer.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from sunerf_tpu.models.fields import FieldOutput
from sunerf_tpu.rendering.emission import ray_deltas


@dataclasses.dataclass(frozen=True)
class ThomsonHead:
    Rs_per_ds: float = 1.0
    limb_darkening: float = 0.63
    C_0: float = 1.0
    d_output: int = 2

    def raw2outputs(self, field_out: FieldOutput, z_vals: jnp.ndarray,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    query_points: jnp.ndarray,
                    wavelengths: jnp.ndarray | None = None) -> dict:
        raw = field_out.raw
        dists = ray_deltas(z_vals, rays_d)          # [R, S]
        rho = 10.0 ** raw[..., 0]                   # electron density [R, S]

        solar_radius = 1.0 / self.Rs_per_ds
        s_q = jnp.linalg.norm(query_points[..., :3], axis=-1)   # Sun-to-point [R, S]
        # clamp: points inside the Sun would give |sin| > 1
        sin_omega = jnp.clip(solar_radius / jnp.maximum(s_q, 1e-6), 0.0, 1.0 - 1e-6)
        omega = jnp.arcsin(sin_omega)
        cos_omega = jnp.cos(omega)

        z = z_vals * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)  # observer distance

        # sin^2(chi): chi = angle between line of sight and the Sun-to-point vector
        cross = jnp.cross(rays_o, rays_d)
        sin_chi2 = jnp.sum(cross * cross, axis=-1)[:, None] / (s_q ** 2)

        u = self.limb_darkening
        ln = jnp.log((1.0 + sin_omega) / cos_omega)
        cos2_sin = cos_omega ** 2 / sin_omega
        A = cos_omega * sin_omega ** 2
        B = -(1.0 / 8.0) * (1.0 - 3.0 * sin_omega ** 2
                            - cos2_sin * (1.0 + 3.0 * sin_omega ** 2) * ln)
        C = 4.0 / 3.0 - cos_omega - cos_omega ** 3 / 3.0
        D = (1.0 / 8.0) * (5.0 + sin_omega ** 2
                           - cos2_sin * (5.0 - sin_omega ** 2) * ln)

        intensity_T = (1.0 - u) * C + u * D
        intensity_pB = sin_chi2 * ((1.0 - u) * A + u * B)
        intensity_tB = 2.0 * intensity_T - intensity_pB
        # negative intensities are unphysical; NaN scrub mirrors thompson.py:76-84
        intensity_pB = jnp.nan_to_num(jnp.abs(intensity_pB), nan=0.0, posinf=0.0, neginf=0.0)
        intensity_tB = jnp.nan_to_num(jnp.abs(intensity_tB), nan=0.0, posinf=0.0, neginf=0.0)

        point_tB = (self.C_0 * rho) * intensity_tB * dists
        point_pB = (self.C_0 * rho) * intensity_pB * dists
        pixel_B = jnp.stack([jnp.sum(point_tB, axis=-1), jnp.sum(point_pB, axis=-1)],
                            axis=-1)  # [R, 2]

        rho_sum = jnp.sum(rho, axis=1, keepdims=True)
        pixel_density = jnp.sum(rho * dists, axis=1)
        distance_from_sun = jnp.sum(rho * s_q, axis=1) / (rho_sum[:, 0] + 1e-10)
        distance_from_obs = jnp.sum(rho * z, axis=1) / (rho_sum[:, 0] + 1e-10)
        weights = rho / (rho_sum + 1e-10)

        return {'image': pixel_B, 'weights': weights,
                'regularizing_quantity': jnp.zeros_like(rho),
                'pixel_density': pixel_density,
                'distance_from_sun': distance_from_sun,
                'distance_from_obs': distance_from_obs}

    def occupancy_activity(self, raw: jnp.ndarray) -> jnp.ndarray:
        """Electron density drives the scattered brightness."""
        return 10.0 ** raw[..., 0]

    def regularization(self, distance: jnp.ndarray,
                       regularizing_quantity: jnp.ndarray) -> jnp.ndarray:
        # the reference defines no Thomson regularizer (head is orphaned there)
        return jnp.zeros_like(distance)
