"""Rendering orchestrator: stratified sampling -> coarse field pass ->
hierarchical resampling -> fine field pass -> physics-head quadrature.

Functional redesign of the reference SuNeRFRendering
(sunerf/rendering/base_tracing.py:8-132): static sample counts, explicit PRNG
keys, and a single FieldOutput contract so all heads (emission, density-
temperature, Thomson) share one code path. Everything is jit-compatible; the
whole forward (both MLP passes + quadrature) compiles to one XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sunerf_tpu.core.occupancy import OccupancyConfig, occupancy_sample
from sunerf_tpu.core.sampling import (hierarchical_sample, spherical_sample,
                                      stratified_sample)
from sunerf_tpu.models.fields import FieldOutput


@dataclasses.dataclass(frozen=True, eq=False)
class Renderer:
    """Differentiable volume renderer over a neural (or analytic) field.

    field_apply: (params, points [N, 4]) -> FieldOutput.
    head: physics quadrature (EmissionHead / DensityTemperatureHead / ThomsonHead).
    Sampling defaults match the reference: 64 stratified samples spanning
    +/-1.3 Rsun around the Sun, 128 hierarchical samples (train/sampling.py:6,58,106).
    """
    field_apply: Callable[[dict, jnp.ndarray], FieldOutput]
    head: object
    # optional separate apply for the coarse pass (proposal-network style:
    # the coarse pass exists to place fine samples, so a much smaller field
    # suffices — mip-NeRF 360's proposal MLP insight; None = reference
    # parity, same architecture for both passes)
    coarse_field_apply: Optional[Callable] = None
    Rs_per_ds: float = 1.0
    n_stratified: int = 64
    n_hierarchical: int = 128
    sample_distance: float = 1.3
    sampling: str = 'stratified'  # 'stratified' | 'spherical'
    perturb: bool = True
    perturb_hierarchical: bool = False
    # opt-in occupancy-guided sampling (core/occupancy.py): when set AND the
    # params carry an 'occupancy' grid, the stratified pass concentrates its
    # samples into occupied space (off = reference parity)
    occupancy: Optional[OccupancyConfig] = None
    # serializable description for checkpoint reconstruction (systems.from_spec)
    spec: Optional[dict] = None

    def __post_init__(self):
        # occupancy_sample probes the stratified sampler's [|o|-d, |o|+d]
        # near/far bounds; combining it with another sampler (e.g. Thomson's
        # 'spherical') would silently change the integration domain, not just
        # the sample density — reject the combination outright.
        if self.occupancy is not None and self.sampling != 'stratified':
            raise ValueError(
                f"occupancy-guided sampling assumes the stratified sampler's "
                f"integration bounds; got sampling={self.sampling!r}. Disable "
                f"occupancy or use sampling='stratified'.")

    @property
    def solar_radius(self) -> float:
        return 1.0 / self.Rs_per_ds

    def _sample(self, rays_o, rays_d, key, occupancy_grid=None):
        kwargs = dict(n_samples=self.n_stratified,
                      distance=self.sample_distance / self.Rs_per_ds,
                      solar_radius=self.solar_radius, key=key)
        if self.occupancy is not None and occupancy_grid is not None:
            return occupancy_sample(rays_o, rays_d, occupancy_grid,
                                    self.occupancy, **kwargs)
        if self.sampling == 'stratified':
            return stratified_sample(rays_o, rays_d, **kwargs)
        if self.sampling == 'spherical':
            return spherical_sample(rays_o, rays_d, **kwargs)
        raise ValueError(f'Unknown sampling type {self.sampling}')

    def _render_pass(self, params, query_points_time, rays_o, rays_d, z_vals,
                     wavelengths, apply_fn=None):
        """Flatten query points, evaluate the field, run the head quadrature."""
        n_rays, n_samples = query_points_time.shape[:2]
        flat = query_points_time.reshape(-1, query_points_time.shape[-1])
        # sample points carry no gradient: stratified z comes from data + PRNG,
        # hierarchical z is detached (reference sampling.py:120), rays/times
        # are data. Making that explicit lets the fused kernel skip its dead
        # point-cotangent computation (systems._select_apply compute_dpts=False).
        flat = jax.lax.stop_gradient(flat)
        field_out = (apply_fn or self.field_apply)(params, flat)
        raw = field_out.raw.reshape(n_rays, n_samples, -1)
        field_out = FieldOutput(raw=raw, log_abs=field_out.log_abs,
                                vol_c=field_out.vol_c)
        return self.head.raw2outputs(field_out, z_vals, rays_o, rays_d,
                                     query_points_time[..., :3], wavelengths)

    def __call__(self, params: dict, rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                 times: jnp.ndarray, key: Optional[jax.Array] = None,
                 wavelengths: Optional[jnp.ndarray] = None) -> dict:
        """Full coarse+fine forward pass.

        Args:
            params: {'coarse': pytree, 'fine': pytree} field parameters.
            rays_o, rays_d: [R, 3]; times: [R, 1] normalized observation times.
            key: PRNG key for sampling jitter (None = deterministic, eval mode).
            wavelengths: [R, W] for multi-channel heads.

        Returns:
            dict with image, coarse_image, fine_image, height_map,
            absorption_map, regularization, z_vals_stratified, z_vals_hierarchical
            (same keys as reference base_tracing.py:72,92-110).
        """
        if key is not None:
            key_s, key_h = jax.random.split(key)
        else:
            key_s = key_h = None

        occupancy_grid = params.get('occupancy') if isinstance(params, dict) else None
        strat = self._sample(rays_o, rays_d, key_s if self.perturb else None,
                             occupancy_grid=occupancy_grid)
        z_vals = strat['z_vals']
        qpt = _with_time(strat['points'], times)

        coarse_out = self._render_pass(params['coarse'], qpt, rays_o, rays_d,
                                       z_vals, wavelengths,
                                       apply_fn=self.coarse_field_apply)

        hier = hierarchical_sample(rays_o, rays_d, z_vals, coarse_out['weights'],
                                   n_samples=self.n_hierarchical,
                                   key=key_h if self.perturb_hierarchical else None)
        z_comb = hier['z_vals']
        qpt_fine = _with_time(hier['points'], times)

        fine_out = self._render_pass(params['fine'], qpt_fine, rays_o, rays_d,
                                     z_comb, wavelengths)

        distance = jnp.linalg.norm(hier['points'], axis=-1)  # [R, S_fine]
        reg_q = fine_out['regularizing_quantity']
        outputs = {
            'image': fine_out['image'],
            'coarse_image': coarse_out['image'],
            'fine_image': fine_out['image'],
            'z_vals_stratified': z_vals,
            'z_vals_hierarchical': hier['new_z_samples'],
            'height_map': jnp.sum(fine_out['weights'] * distance, axis=-1),
            'absorption_map': jnp.sum(1.0 - reg_q, axis=-1),
            'regularization': self.head.regularization(distance, reg_q),
        }
        # propagate any extra head outputs (e.g. Thomson brightness maps)
        for k, v in fine_out.items():
            if k not in ('image', 'weights', 'regularizing_quantity'):
                outputs.setdefault(k, v)
        return outputs

    def forward_points(self, params: dict, query_points: jnp.ndarray) -> FieldOutput:
        """Direct field query for volume extraction (base_tracing.py:113-116);
        uses the fine model."""
        flat = query_points.reshape(-1, query_points.shape[-1])
        return self.field_apply(params['fine'], flat)


def _with_time(points: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Append the per-ray time coordinate to [R, S, 3] sample points -> [R, S, 4]."""
    times = times.reshape(times.shape[0], 1, 1)
    exp_times = jnp.broadcast_to(times, (points.shape[0], points.shape[1], 1))
    return jnp.concatenate([points, exp_times.astype(points.dtype)], axis=-1)
