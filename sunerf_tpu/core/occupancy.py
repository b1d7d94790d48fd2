"""Factorized occupancy grid for empty-space skipping (opt-in).

Solar emission concentrates in a thin shell above the photosphere; uniform
stratified sampling spends most of its samples in empty space. This module
maintains a coarse occupancy estimate of the scene and redistributes the
*same, static number* of samples into occupied regions — matched image quality
at roughly half the sample count, which is where the throughput win comes from
(configs enable it together with reduced n_stratified/n_hierarchical).

TPU-first design (vs the CUDA occupancy grids in NerfAcc/Instant-NGP that the
reference ecosystem uses — see PAPERS.md):

  * The grid is FACTORIZED into a radial profile occ_r[Nr] and an angular map
    occ_ang[Nt, Np], each the running max of cell activity over its other
    coordinate, PLUS a coarse full-3D volume occ_vol[nvol] (default 16x8x16).
    The per-point estimate min(occ_r, occ_ang, occ_vol) is a provable upper
    bound of the cell's true occupancy (every factor is a max over a superset
    of the cell), so occupied space is never culled. The volume factor exists
    because the separable bound alone DEGENERATES on the canonical solar
    scene — a thin full shell plus a compact streamer reaching high r in a
    narrow sector: the shell lights every angular cell and the streamer
    lights every radial shell, so min(occ_r, occ_ang) is 1 everywhere and
    nothing can ever be culled (the round-3 value-case finding). The coarse
    3D factor represents exactly the (high-r x off-sector) emptiness the
    separable factors cannot.
  * Lookups are gather-free: cell indices become one-hot matrices contracted
    against the profiles on the MXU (take_along_axis-style gathers are
    catastrophically slow on TPU; one-hot matvecs are microseconds).
  * Updates are scatter-free: the update evaluates the field at CELL-ORDERED
    jittered points, so the per-cell maxima are plain axis reductions of a
    [Nr, Nt, Np] activity tensor — no scatter-max, no atomics (the CUDA
    idiom), just a reshape and two maxes.
  * Everything is static-shaped and jit-compatible; the grid state is a tiny
    pytree (Nr + Nt*Np floats) carried inside the params dict (zero-gradient
    leaves — Adam's update for them is identically zero), so checkpointing,
    replication, and the save_state bundle need no new plumbing.

The sampler keeps the reference's quadrature semantics (sorted z_vals along
the ray, the same [near, far] integration bounds — sunerf/train/sampling.py:
56-102): occupancy only reshapes the sample *density* via the inverse-CDF
sampler, it never changes the integral being estimated. A pdf floor keeps
every bin reachable so the EMA can recover from a stale grid.

Off by default everywhere (reference parity); enable via the rendering config
(`occupancy: {enabled: true, ...}`).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    """Static occupancy-grid configuration (hashable, safe to close over jit).

    Radii are in solar radii; converted with Rs_per_ds at the call sites.
    """
    nr: int = 64            # radial shells over [r_min, r_max]
    ntheta: int = 16        # colatitude cells over [0, pi]
    nphi: int = 32          # longitude cells over [-pi, pi]
    r_min: float = 1.0      # inner radius (solar surface) [Rsun]
    r_max: float = 1.3      # outer radius of the occupied volume [Rsun]
    nvol: Optional[tuple] = None  # coarse 3D volume factor dims (r, theta,
                                  # phi); each must divide (nr, ntheta,
                                  # nphi). None: auto ~(nr/4, nt/2, np/2)
                                  # snapped to divisors (16x8x16 at defaults)
    n_probe: int = 64       # occupancy probes per ray feeding the CDF
    floor: float = 0.02     # pdf floor: minimum relative density everywhere
    decay: float = 0.97     # EMA-max decay per update
    threshold: float = 0.05  # occupied if activity > threshold * robust max
                             # (the 99.5th-percentile activity; see
                             # update_occupancy for why not the mean)
    update_every: int = 16  # trainer updates the grid every N steps
    warmup: int = 500       # steps before the first update (field untrained)

    def __post_init__(self):
        if self.nvol is None:
            # gcd snaps the ~(1/4, 1/2, 1/2) targets to exact divisors for
            # any grid dims (gcd(d, 0) = d covers tiny test grids)
            import math
            auto = (math.gcd(self.nr, self.nr // 4),
                    math.gcd(self.ntheta, self.ntheta // 2),
                    math.gcd(self.nphi, self.nphi // 2))
            object.__setattr__(self, 'nvol', auto)
        nvr, nvt, nvp = self.nvol
        if self.nr % nvr or self.ntheta % nvt or self.nphi % nvp:
            raise ValueError(
                f'nvol {self.nvol} must divide (nr, ntheta, nphi) = '
                f'({self.nr}, {self.ntheta}, {self.nphi})')


def init_occupancy(config: OccupancyConfig) -> dict:
    """Fully-occupied grid. occupancy_sample detects this warmup state and
    uses an exactly uniform pdf over [near, far] (matching the reference's
    stratified density everywhere, including beyond r_max — occupancy_at
    alone would down-weight off-limb segments ~1/floor before the field has
    trained). A plain dict of arrays (not a NamedTuple) so it flows through
    checkpoint flattening, save_state bundles, and mesh replication with
    zero special cases."""
    return {'occ_r': jnp.ones((config.nr,), jnp.float32),
            'occ_ang': jnp.ones((config.ntheta, config.nphi), jnp.float32),
            'occ_vol': jnp.ones(config.nvol, jnp.float32)}


def _onehot_lookup(table_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table[idx] for integer idx [...,] via a one-hot MXU contraction."""
    iota = jnp.arange(table_flat.shape[0])
    onehot = (idx[..., None] == iota).astype(table_flat.dtype)
    return onehot @ table_flat


def occupancy_at(grid: dict, config: OccupancyConfig,
                 points: jnp.ndarray, solar_radius: float = 1.0) -> jnp.ndarray:
    """Occupancy estimate in [0, 1] at [..., 3] spatial points (model units;
    solar_radius = 1/Rs_per_ds scales the grid's radii into model units)."""
    r_min = config.r_min * solar_radius
    r_max = config.r_max * solar_radius
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    r = jnp.sqrt(x * x + y * y + z * z)

    dr = (r_max - r_min) / config.nr
    ir = jnp.clip(jnp.floor((r - r_min) / dr), 0, config.nr - 1).astype(jnp.int32)
    occ_r = _onehot_lookup(grid['occ_r'], ir)

    theta = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-12), -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    it = jnp.clip((theta / (jnp.pi / config.ntheta)).astype(jnp.int32),
                  0, config.ntheta - 1)
    ip = jnp.clip(((phi + jnp.pi) / (2 * jnp.pi / config.nphi)).astype(jnp.int32),
                  0, config.nphi - 1)
    occ_ang = _onehot_lookup(grid['occ_ang'].reshape(-1),
                             it * config.nphi + ip)

    occ = jnp.minimum(occ_r, occ_ang)
    if 'occ_vol' in grid:  # absent in grids from pre-vol checkpoints
        # coarse-3D lookup as a chain of SMALL one-hot contractions (a flat
        # one-hot over nvr*nvt*nvp cells would materialize a [points, 2048]
        # matrix; the factored chain peaks at [points, nvt*nvp] = 128 floats
        # per point and stays on the MXU)
        vol = grid['occ_vol']
        nvr, nvt, nvp = vol.shape
        oh_r = (ir[..., None] // (config.nr // nvr)
                == jnp.arange(nvr)).astype(vol.dtype)
        oh_t = (it[..., None] // (config.ntheta // nvt)
                == jnp.arange(nvt)).astype(vol.dtype)
        oh_p = (ip[..., None] // (config.nphi // nvp)
                == jnp.arange(nvp)).astype(vol.dtype)
        tmp = jnp.einsum('...r,rtp->...tp', oh_r, vol)
        tmp = jnp.einsum('...t,...tp->...p', oh_t, tmp)
        occ = jnp.minimum(occ, jnp.einsum('...p,...p->...', oh_p, tmp))
    # outside the modeled shell: empty above r_max, solid below r_min (rays
    # are far-clipped at the surface; never cull numerically-inside points)
    return jnp.where(r > r_max, 0.0, jnp.where(r < r_min, 1.0, occ))


def occupancy_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     grid: dict, config: OccupancyConfig,
                     n_samples: int, distance: float, solar_radius: float,
                     key: Optional[jax.Array] = None) -> dict:
    """Occupancy-guided stratified sampling: the reference's [near, far] bounds
    (sunerf/train/sampling.py:56-102) probed at n_probe midpoints, the
    occupancy turned into a per-bin pdf, and n_samples drawn by inverse CDF.

    Returns dict(points=[R, S, 3], z_vals=[R, S]) — same contract as
    stratified_sample; z_vals sorted ascending.
    """
    from sunerf_tpu.core.sampling import (_ray_sphere_near_intersection,
                                          sample_pdf)
    obs_distance = jnp.linalg.norm(rays_o, axis=-1)
    t_inner, _, hit = _ray_sphere_near_intersection(rays_o, rays_d, solar_radius)
    near = obs_distance - distance
    far = jnp.where(hit, t_inner, obs_distance + distance)

    edges_t = jnp.linspace(0.0, 1.0, config.n_probe + 1, dtype=rays_o.dtype)
    edges = near[:, None] * (1.0 - edges_t) + far[:, None] * edges_t  # [R, M+1]
    mids = 0.5 * (edges[:, 1:] + edges[:, :-1])                      # [R, M]
    probe_pts = rays_o[:, None, :] + rays_d[:, None, :] * mids[..., None]
    occ = occupancy_at(grid, config, probe_pts, solar_radius)

    # warmup / fully-occupied grid: sample uniformly over the full [near, far]
    # span (occ is 0 beyond r_max by construction, which would otherwise
    # down-weight off-limb segments ~1/floor before the first grid update)
    warm = (jnp.min(grid['occ_r']) >= 1.0) & (jnp.min(grid['occ_ang']) >= 1.0)
    if 'occ_vol' in grid:
        warm = warm & (jnp.min(grid['occ_vol']) >= 1.0)
    pdf = jnp.where(warm, jnp.ones_like(occ), occ + config.floor)
    z_vals = sample_pdf(edges, pdf, n_samples, key=key)
    # sample positions are data, not a differentiable function of the grid
    # (matches the detach semantics of hierarchical sampling); without this,
    # grads would leak into the zero-gradient occupancy leaves in params
    z_vals = jax.lax.stop_gradient(jnp.sort(z_vals, axis=-1))
    points = rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]
    return {'points': points, 'z_vals': z_vals}


def update_occupancy(grid: dict, config: OccupancyConfig,
                     field_apply, params, activity_fn, key: jax.Array,
                     time: jnp.ndarray, solar_radius: float = 1.0) -> dict:
    """One EMA-max update from the (fine) field.

    Evaluates the field at one jittered point per cell, laid out CELL-ORDERED
    so the per-axis maxima are reductions, not scatters. activity_fn maps the
    field's raw output [..., C] to a nonnegative "how much does this cell
    matter" scalar (heads provide it: emission -> exp(raw0) + relu(raw1),
    DT -> density^2). A cell is occupied if its activity exceeds
    threshold * the 99.5th-percentile activity (a robust max); profiles decay
    toward empty and are refreshed by the max, so stale occupancy fades in
    ~1/(1-decay) updates.

    Why a robust-max reference and not the mean (the round-3 value-case
    finding, OCC_VALUE_r3): when most cells are a dim uniform background, the
    mean IS the background, so `act > threshold * mean` can never cull it —
    the one regime the grid exists for (a compact bright structure in mostly
    empty space) is exactly where a mean reference degenerates. Against the
    robust max, background below threshold * peak is culled regardless of how
    much volume it fills. The percentile (not the raw max) keeps a single
    transient hot cell from inflating the reference and culling the real
    scene in one update — the training death spiral observed at aggressive
    lr. Mistaken culls self-heal: the update probes every cell each time, so
    a cell whose activity recovers re-lights on the next update.
    """
    nr, nt, npp = config.nr, config.ntheta, config.nphi
    r_min = config.r_min * solar_radius
    r_max = config.r_max * solar_radius
    u = jax.random.uniform(key, (nr, nt, npp, 3))
    r = r_min + (jnp.arange(nr)[:, None, None] + u[..., 0]) * (r_max - r_min) / nr
    theta = (jnp.arange(nt)[None, :, None] + u[..., 1]) * jnp.pi / nt
    phi = -jnp.pi + (jnp.arange(npp)[None, None, :] + u[..., 2]) * 2 * jnp.pi / npp
    st = jnp.sin(theta)
    xyz = jnp.stack([r * st * jnp.cos(phi), r * st * jnp.sin(phi),
                     r * jnp.cos(theta)], axis=-1)
    t = jnp.broadcast_to(jnp.asarray(time, xyz.dtype).reshape(-1)[:1],
                         (nr, nt, npp))
    pts = jnp.concatenate([xyz, t[..., None]], axis=-1).reshape(-1, 4)

    raw = field_apply(params, pts).raw.reshape(nr, nt, npp, -1)
    act = activity_fn(raw)
    robust_max = jnp.percentile(act, 99.5)
    occupied = (act > config.threshold * robust_max).astype(jnp.float32)
    out = {
        'occ_r': jnp.maximum(grid['occ_r'] * config.decay,
                             occupied.max(axis=(1, 2))),
        'occ_ang': jnp.maximum(grid['occ_ang'] * config.decay,
                               occupied.max(axis=0))}
    if 'occ_vol' in grid:
        nvr, nvt, nvp = grid['occ_vol'].shape
        # block-max pooling: cell-ordered layout makes this a static reshape
        # + axis reductions, no scatter
        pooled = occupied.reshape(nvr, nr // nvr, nvt, nt // nvt,
                                  nvp, npp // nvp).max(axis=(1, 3, 5))
        out['occ_vol'] = jnp.maximum(grid['occ_vol'] * config.decay, pooled)
    return out
