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
from sunerf_tpu.core.sampling import (hierarchical_sample, sample_pdf,
                                      spherical_sample, stratified_sample)
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
    # opt-in adaptive per-ray budgets ("early ray termination", TPU-shaped):
    # during training (key given), the tier_fraction dimmest rays — ranked by
    # the coarse pass's predicted brightness — run the fine pass with only
    # tier_samples samples drawn from the coarse CDF, while the bright rays
    # keep the full stratified+hierarchical budget. Static shapes throughout:
    # an argsort partitions the batch at a compile-time split point, and rays
    # move between tiers via exact one-hot permutation matmuls on the MXU
    # (gathers are catastrophically slow on TPU). 0.0 = off (reference
    # parity; the reference evaluates every ray at the full budget).
    tier_fraction: float = 0.0
    tier_samples: int = 32
    # apply the tiers during key=None (eval) forward passes too — opt-in for
    # fast full-disk/video rendering (ModelLoader(tier=...)); off by default
    # so validation and deployment renders stay full-budget
    tier_eval: bool = False
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
        if not 0.0 <= self.tier_fraction < 1.0:
            raise ValueError(f'tier_fraction must be in [0, 1), got '
                             f'{self.tier_fraction}')
        if self.tier_fraction and self.tier_samples < 4:
            raise ValueError('tier_samples must be >= 4')

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

        if self.tier_fraction and (key is not None or self.tier_eval):
            return self._tiered_fine(params, rays_o, rays_d, times, z_vals,
                                     coarse_out, key_h, wavelengths)

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

    def _tiered_fine(self, params, rays_o, rays_d, times, z_vals, coarse_out,
                     key_h, wavelengths):
        """Adaptive per-ray budgets: the dim tier_fraction of the batch runs
        the fine pass at tier_samples samples; bright rays keep the full
        budget. The TPU-shaped replacement for CUDA-style per-ray early
        termination (divergent loops don't map to the MXU): a static
        argsort-partition of the batch by the coarse pass's predicted
        brightness, rays moved between tiers by exact one-hot permutation
        matmuls (HIGHEST precision - a 0/1 row-selector in bf16x6 passes is
        exact for f32 values). Training-only; eval renders every ray at the
        full budget. Loss weighting is preserved: outputs return in the
        ORIGINAL ray order, so the mean-over-rays loss is unchanged in form.
        """
        R = rays_o.shape[0]
        n_lo = int(round(R * self.tier_fraction))
        score = jax.lax.stop_gradient(coarse_out['image']).max(axis=-1)
        order = jnp.argsort(score)  # dim rays first
        iota = jnp.arange(R)
        P = (order[:, None] == iota[None, :]).astype(z_vals.dtype)  # [R, R]

        def perm(mat, x):
            flat = x.reshape(R, -1)
            out = jnp.matmul(mat, flat, precision=jax.lax.Precision.HIGHEST)
            return out.reshape(x.shape)

        rays_o_p = perm(P, rays_o)
        rays_d_p = perm(P, rays_d)
        times_p = perm(P, times)
        z_p = perm(P, z_vals)
        w_p = perm(P, coarse_out['weights'])
        wl_p = perm(P, wavelengths) if wavelengths is not None else None
        lo, hi = slice(0, n_lo), slice(n_lo, R)
        wl_lo = wl_p[lo] if wl_p is not None else None
        wl_hi = wl_p[hi] if wl_p is not None else None

        # bright tier: reference-parity stratified+hierarchical budget
        hier = hierarchical_sample(rays_o_p[hi], rays_d_p[hi], z_p[hi],
                                   w_p[hi], n_samples=self.n_hierarchical,
                                   key=key_h if self.perturb_hierarchical
                                   else None)
        fine_hi = self._render_pass(params['fine'],
                                    _with_time(hier['points'], times_p[hi]),
                                    rays_o_p[hi], rays_d_p[hi], hier['z_vals'],
                                    wl_hi)

        # dim tier: tier_samples samples straight from the coarse CDF (the
        # coarse pass's belief of where the integrand mass lies)
        z_mid = 0.5 * (z_p[lo, 1:] + z_p[lo, :-1])
        z_lo = sample_pdf(z_mid, w_p[lo][..., 1:-1], self.tier_samples,
                          key=None)
        z_lo = jax.lax.stop_gradient(jnp.sort(z_lo, axis=-1))
        pts_lo = (rays_o_p[lo, None, :]
                  + rays_d_p[lo, None, :] * z_lo[..., :, None])
        fine_lo = self._render_pass(params['fine'],
                                    _with_time(pts_lo, times_p[lo]),
                                    rays_o_p[lo], rays_d_p[lo], z_lo, wl_lo)

        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        unperm = lambda x: perm(P.T, x)  # inverse permutation
        image = unperm(cat(fine_lo['image'], fine_hi['image']))
        dist_lo = jnp.linalg.norm(pts_lo, axis=-1)
        dist_hi = jnp.linalg.norm(hier['points'], axis=-1)
        height = unperm(cat(
            jnp.sum(fine_lo['weights'] * dist_lo, axis=-1),
            jnp.sum(fine_hi['weights'] * dist_hi, axis=-1)))
        absorption = unperm(cat(
            jnp.sum(1.0 - fine_lo['regularizing_quantity'], axis=-1),
            jnp.sum(1.0 - fine_hi['regularizing_quantity'], axis=-1)))
        # per-ray regularization means (tiers have different sample counts)
        reg = unperm(cat(
            jnp.mean(self.head.regularization(
                dist_lo, fine_lo['regularizing_quantity']), axis=-1),
            jnp.mean(self.head.regularization(
                dist_hi, fine_hi['regularizing_quantity']), axis=-1)))
        return {
            'image': image,
            'coarse_image': coarse_out['image'],
            'fine_image': image,
            'z_vals_stratified': z_vals,
            'z_vals_hierarchical': hier['new_z_samples'],  # bright tier
            'height_map': height,
            'absorption_map': absorption,
            'regularization': reg,
        }

    def forward_points(self, params: dict, query_points: jnp.ndarray) -> FieldOutput:
        """Direct field query for volume extraction (base_tracing.py:113-116).

        Always queries the FINE model with self.field_apply — intentionally
        so under a proposal-style coarse field (coarse_field_apply set): the
        tiny coarse field exists only to place samples, and volume products
        should come from the full-capacity model."""
        flat = query_points.reshape(-1, query_points.shape[-1])
        return self.field_apply(params['fine'], flat)


def _with_time(points: jnp.ndarray, times: jnp.ndarray) -> jnp.ndarray:
    """Append the per-ray time coordinate to [R, S, 3] sample points -> [R, S, 4]."""
    times = times.reshape(times.shape[0], 1, 1)
    exp_times = jnp.broadcast_to(times, (points.shape[0], points.shape[1], 1))
    return jnp.concatenate([points, exp_times.astype(points.dtype)], axis=-1)
