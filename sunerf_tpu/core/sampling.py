"""Ray sampling strategies (stratified, spherical, hierarchical).

Functional re-design of the reference samplers (sunerf/train/sampling.py):
pure functions with explicit PRNG keys and static sample counts (compile-time
constants, XLA-friendly). The ray-sphere clipping uses discriminant masking
instead of the reference's NaN propagation (sampling.py:81-88) — identical
results without relying on NaN semantics.

Shapes: rays_o/rays_d [R, 3]; all z_vals [R, S] sorted ascending per ray.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _ray_sphere_near_intersection(rays_o, rays_d, radius):
    """Distance along each ray to its first intersection with the sphere of the
    given radius centered at the origin. Returns (t_near, t_far, hit_mask)."""
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1)
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius ** 2
    disc = b * b - 4.0 * a * c
    hit = disc >= 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = (-b - sq) / (2.0 * a)
    t_far = (-b + sq) / (2.0 * a)
    return t_near, t_far, hit


def _perturb_bins(z_vals, key):
    """Uniform jitter within bins defined by consecutive z values
    (reference sampling.py:92-98)."""
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def stratified_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      n_samples: int = 64, distance: float = 1.3,
                      solar_radius: float = 1.0,
                      key: Optional[jax.Array] = None):
    """Uniform bins in [|o| - distance, |o| + distance] along each ray, with the
    far plane clipped to the solar-surface intersection where the ray hits the
    Sun (reference StratifiedSampler, sampling.py:56-102).

    Args:
        key: jitter bins uniformly when provided (perturb=True equivalent).

    Returns:
        dict(points=[R, S, 3], z_vals=[R, S]).
    """
    obs_distance = jnp.linalg.norm(rays_o, axis=-1)
    t_inner, _, hit = _ray_sphere_near_intersection(rays_o, rays_d, solar_radius)
    near = obs_distance - distance
    far = jnp.where(hit, t_inner, obs_distance + distance)

    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    z_vals = near[:, None] * (1.0 - t_vals) + far[:, None] * t_vals
    if key is not None:
        z_vals = _perturb_bins(z_vals, key)
    points = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return {'points': points, 'z_vals': z_vals}


def spherical_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     n_samples: int = 64, distance: float = 2.0,
                     solar_radius: float = 1.0,
                     key: Optional[jax.Array] = None):
    """Sample between entry/exit of a bounding sphere of the given radius, far
    plane clipped at the solar surface (reference SphericalSampler,
    sampling.py:4-54). Rays that miss the bounding sphere produce NaN in the
    reference; here they collapse to a zero-length segment at closest approach.
    """
    t_near_b, t_far_b, hit_b = _ray_sphere_near_intersection(rays_o, rays_d, distance)
    t_inner, _, hit_s = _ray_sphere_near_intersection(rays_o, rays_d, solar_radius)
    # closest-approach fallback for rays missing the bounding sphere
    t_mid = -jnp.sum(rays_o * rays_d, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)
    near = jnp.where(hit_b, t_near_b, t_mid)
    far = jnp.where(hit_s, t_inner, jnp.where(hit_b, t_far_b, t_mid))

    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=rays_o.dtype)
    z_vals = near[:, None] * (1.0 - t_vals) + far[:, None] * t_vals
    if key is not None:
        z_vals = _perturb_bins(z_vals, key)
    points = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return {'points': points, 'z_vals': z_vals}


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inverse-CDF sampling of the piecewise PDF defined by (bins, weights)
    (reference HierarchicalSampler.sample_pdf, sampling.py:128-169).

    Args:
        bins: [R, M+1] bin centers.
        weights: [R, M] non-negative weights.
        n_samples: number of samples to draw per ray.
        key: stratified uniform draws when provided; else linspace(0, 1).

    Returns:
        [R, n_samples] sample positions.

    The searchsorted(right=True) is expressed as a vectorized comparison-count
    (O(M * n) boolean ops on the VPU) instead of a per-ray binary search —
    faster on TPU for the small, static M used here.
    """
    pdf = (weights + 1e-5) / jnp.sum(weights + 1e-5, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, M+1]

    if key is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        # STRATIFIED uniforms (one jittered draw per 1/n stratum), not i.i.d.
        # rand: i.i.d. draws clump (measured -1.9 dB on the occupancy-guided
        # closed loop, where this path replaces the stratified sampler); the
        # reference's torch.rand here (sampling.py:141-147) is i.i.d., so
        # this is a strict variance reduction at identical cost
        jitter = jax.random.uniform(key, (*cdf.shape[:-1], n_samples),
                                    dtype=cdf.dtype)
        u = (jnp.arange(n_samples, dtype=cdf.dtype) + jitter) / n_samples

    # index i such that cdf[i-1] <= u < cdf[i]  (== searchsorted right)
    inds = jnp.sum(cdf[..., None, :] <= u[..., :, None], axis=-1)
    m = cdf.shape[-1]
    below = jnp.clip(inds - 1, 0, m - 1)
    above = jnp.clip(inds, 0, m - 1)

    # gather via one-hot contraction: take_along_axis lowers to per-element
    # dynamic slices on TPU (~6 ms per step at batch 1024); a [n, M] x [M]
    # batched matvec runs on the MXU in microseconds
    iota = jnp.arange(m)
    oh_below = (below[..., None] == iota).astype(cdf.dtype)  # [R, n, M]
    oh_above = (above[..., None] == iota).astype(cdf.dtype)
    cdf_below = jnp.einsum('rnm,rm->rn', oh_below, cdf)
    cdf_above = jnp.einsum('rnm,rm->rn', oh_above, cdf)
    bins_below = jnp.einsum('rnm,rm->rn', oh_below, bins)
    bins_above = jnp.einsum('rnm,rm->rn', oh_above, bins)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                        z_vals: jnp.ndarray, weights: jnp.ndarray,
                        n_samples: int = 128,
                        key: Optional[jax.Array] = None):
    """Resample along rays from the coarse-pass weight distribution
    (reference HierarchicalSampler.forward, sampling.py:111-126).

    The new samples carry no gradient (stop_gradient, matching the reference's
    .detach() at sampling.py:120).

    Returns:
        dict(points=[R, S+n, 3], z_vals=[R, S+n], new_z_samples=[R, n]).
    """
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    new_z = sample_pdf(z_mid, weights[..., 1:-1], n_samples, key=key)
    new_z = jax.lax.stop_gradient(new_z)

    z_combined = jnp.sort(jnp.concatenate([z_vals, new_z], axis=-1), axis=-1)
    points = rays_o[..., None, :] + rays_d[..., None, :] * z_combined[..., :, None]
    return {'points': points, 'z_vals': z_combined, 'new_z_samples': new_z}
