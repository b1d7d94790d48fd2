"""Occupancy-grid empty-space skipping (core/occupancy.py): lookup
correctness, scatter-free updates, sampling concentration, parity fallback,
and training integration (zero-gradient grid leaves)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.core.occupancy import (OccupancyConfig, init_occupancy,
                                       occupancy_at, occupancy_sample,
                                       update_occupancy)
from sunerf_tpu.core.sampling import stratified_sample

CFG = OccupancyConfig(nr=8, ntheta=4, nphi=6)


def _random_grid(key):
    k1, k2 = jax.random.split(key)
    return {'occ_r': jax.random.uniform(k1, (CFG.nr,)),
            'occ_ang': jax.random.uniform(k2, (CFG.ntheta, CFG.nphi))}


def test_occupancy_at_matches_dense_indexing():
    grid = _random_grid(jax.random.key(0))
    key = jax.random.key(1)
    # random points spanning inside/outside the shell
    r = jax.random.uniform(key, (500,), minval=0.9, maxval=1.5)
    kt, kp = jax.random.split(jax.random.key(2))
    theta = jax.random.uniform(kt, (500,), minval=0.0, maxval=np.pi)
    phi = jax.random.uniform(kp, (500,), minval=-np.pi, maxval=np.pi)
    pts = jnp.stack([r * jnp.sin(theta) * jnp.cos(phi),
                     r * jnp.sin(theta) * jnp.sin(phi),
                     r * jnp.cos(theta)], axis=-1)
    got = np.asarray(occupancy_at(grid, CFG, pts))

    occ_r = np.asarray(grid['occ_r'])
    occ_ang = np.asarray(grid['occ_ang'])
    rn, tn, pn = np.asarray(r), np.asarray(theta), np.asarray(phi)
    ir = np.clip(((rn - CFG.r_min) / ((CFG.r_max - CFG.r_min) / CFG.nr)).astype(int),
                 0, CFG.nr - 1)
    it = np.clip((tn / (np.pi / CFG.ntheta)).astype(int), 0, CFG.ntheta - 1)
    ip = np.clip(((pn + np.pi) / (2 * np.pi / CFG.nphi)).astype(int), 0, CFG.nphi - 1)
    want = np.minimum(occ_r[ir], occ_ang[it, ip])
    want = np.where(rn > CFG.r_max, 0.0, np.where(rn < CFG.r_min, 1.0, want))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_update_occupancy_projects_active_cell():
    """A field active exactly on one radial shell x one phi half-space must
    light up exactly those profile entries (scatter-free projection: the
    cell-ordered evaluation makes maxima plain axis reductions)."""

    class FO:
        def __init__(self, raw):
            self.raw = raw

    def field_apply(_params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        phi = jnp.arctan2(pts[:, 1], pts[:, 0])
        # shell 4 of 8 over [1.0, 1.3] is [1.15, 1.1875); phi > 0 is cols 3-5
        act = ((r >= 1.15) & (r < 1.1875) & (phi > 0)).astype(jnp.float32)
        return FO(jnp.stack([act, act], axis=-1))

    zero = {'occ_r': jnp.zeros((CFG.nr,)), 'occ_ang': jnp.zeros((CFG.ntheta, CFG.nphi))}
    grid = update_occupancy(zero, CFG, field_apply, {}, lambda raw: raw[..., 0],
                            jax.random.key(0), 0.0)
    occ_r = np.asarray(grid['occ_r'])
    occ_ang = np.asarray(grid['occ_ang'])
    np.testing.assert_array_equal(occ_r, [0, 0, 0, 0, 1, 0, 0, 0])
    np.testing.assert_array_equal(occ_ang[:, :3], np.zeros((CFG.ntheta, 3)))
    np.testing.assert_array_equal(occ_ang[:, 3:], np.ones((CFG.ntheta, 3)))


def test_update_occupancy_culls_dominant_dim_background():
    """A dim uniform background filling most of the volume must be CULLED
    when a compact bright structure sets the scale — the grid's entire value
    case. The old mean-relative criterion could never do this (when most
    cells are background, the mean IS the background; OCC_VALUE_r3): the
    reference is now the robust max (99.5th-percentile activity)."""

    class FO:
        def __init__(self, raw):
            self.raw = raw

    def field_apply(_params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        phi = jnp.arctan2(pts[:, 1], pts[:, 0])
        # bright compact blob (shell 4, phi in one sextant) on a 1% floor
        blob = ((r >= 1.15) & (r < 1.1875)
                & (phi > 0) & (phi < np.pi / 3)).astype(jnp.float32)
        act = 0.01 + blob
        return FO(jnp.stack([act, act], axis=-1))

    zero = {'occ_r': jnp.zeros((CFG.nr,)),
            'occ_ang': jnp.zeros((CFG.ntheta, CFG.nphi))}
    grid = update_occupancy(zero, CFG, field_apply, {}, lambda raw: raw[..., 0],
                            jax.random.key(0), 0.0)
    occ_r = np.asarray(grid['occ_r'])
    # only the blob shell survives; the 1%-of-peak background (well under
    # threshold=5% of the robust max ~1.01) is culled everywhere else
    np.testing.assert_array_equal(occ_r, [0, 0, 0, 0, 1, 0, 0, 0])
    assert np.asarray(grid['occ_ang']).sum() > 0  # the blob sector is lit


def test_volume_factor_culls_what_separable_factors_cannot():
    """The canonical solar scene — a thin full shell PLUS a compact blob at
    high r in a narrow sector — degenerates the separable bound: the shell
    lights every angular cell and the blob lights its radial shells, so
    min(occ_r, occ_ang) is 1 across the whole blob shell. The coarse 3D
    occ_vol factor must cull (blob shell x off-sector) anyway."""

    class FO:
        def __init__(self, raw):
            self.raw = raw

    def field_apply(_params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        phi = jnp.arctan2(pts[:, 1], pts[:, 0])
        shell = r < 1.075                              # fine shells 0-1
        blob = ((r >= 1.1875) & (r < 1.225)            # fine shell 5
                & (phi > 0) & (phi < np.pi / 3))       # fine phi cell 3
        act = (shell | blob).astype(jnp.float32)
        return FO(jnp.stack([act, act], axis=-1))

    zero = {'occ_r': jnp.zeros((CFG.nr,)),
            'occ_ang': jnp.zeros((CFG.ntheta, CFG.nphi)),
            'occ_vol': jnp.zeros(CFG.nvol)}
    grid = update_occupancy(zero, CFG, field_apply, {}, lambda raw: raw[..., 0],
                            jax.random.key(0), 0.0)

    # the separable factors are blind here: blob shell lit radially, shell
    # lights every angular cell
    assert float(grid['occ_r'][5]) == 1.0
    np.testing.assert_array_equal(np.asarray(grid['occ_ang']),
                                  np.ones((CFG.ntheta, CFG.nphi)))

    in_blob = jnp.asarray([[1.2 * np.cos(0.5), 1.2 * np.sin(0.5), 0.0]])
    off_sector = jnp.asarray([[1.2 * np.cos(2.5), 1.2 * np.sin(2.5), 0.0]])
    assert float(occupancy_at(grid, CFG, in_blob)[0]) == 1.0
    # without the vol factor the off-sector point is (wrongly) occupied...
    separable_only = {k: grid[k] for k in ('occ_r', 'occ_ang')}
    assert float(occupancy_at(separable_only, CFG, off_sector)[0]) == 1.0
    # ...the vol factor culls it
    assert float(occupancy_at(grid, CFG, off_sector)[0]) == 0.0


def test_update_occupancy_ema_decay():
    ones = init_occupancy(CFG)

    class FO:
        def __init__(self, raw):
            self.raw = raw

    def dead_field(_params, pts):
        return FO(jnp.zeros((pts.shape[0], 2)))

    grid = ones
    for i in range(3):
        grid = update_occupancy(grid, CFG, dead_field, {}, lambda r: r[..., 0],
                                jax.random.key(i), 0.0)
    np.testing.assert_allclose(np.asarray(grid['occ_r']), CFG.decay ** 3,
                               rtol=1e-5)


def test_occupancy_sample_concentrates_in_occupied_shell():
    grid = init_occupancy(CFG)
    # only the innermost two shells (r in [1.0, 1.075]) occupied
    grid['occ_r'] = grid['occ_r'].at[2:].set(0.0)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (32, 1))
    dirs = jnp.asarray([[-1.0, 0.0, 0.0]]) + 0.02 * jax.random.normal(
        jax.random.key(0), (32, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = occupancy_sample(rays_o, rays_d, grid, CFG, n_samples=32,
                           distance=1.3, solar_radius=1.0,
                           key=jax.random.key(1))
    z = np.asarray(out['z_vals'])
    assert np.all(np.diff(z, axis=-1) >= 0), 'z_vals must be sorted'
    r = np.linalg.norm(np.asarray(out['points']), axis=-1)
    frac = np.mean((r > 0.99) & (r < 1.09))
    assert frac > 0.6, f'only {frac:.2f} of samples in the occupied shell'


def test_full_grid_matches_stratified_bounds():
    """An all-occupied grid (the init state) must sample the same [near, far]
    span as the reference stratified sampler — parity until the first update."""
    grid = init_occupancy(CFG)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (8, 1))
    dirs = jnp.asarray([[-1.0, 0.05, 0.0]] * 8)
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    occ = occupancy_sample(rays_o, rays_d, grid, CFG, n_samples=64,
                           distance=1.3, solar_radius=1.0, key=None)
    ref = stratified_sample(rays_o, rays_d, n_samples=64, distance=1.3,
                            solar_radius=1.0, key=None)
    z_occ, z_ref = np.asarray(occ['z_vals']), np.asarray(ref['z_vals'])
    np.testing.assert_allclose(z_occ[:, 0], z_ref[:, 0], atol=0.05)
    np.testing.assert_allclose(z_occ[:, -1], z_ref[:, -1], atol=0.05)
    # near-uniform spacing: no gap wildly larger than the uniform bin
    gaps = np.diff(z_occ, axis=-1)
    uniform = (z_ref[:, -1] - z_ref[:, 0]) / 63
    assert gaps.max() < 3.0 * uniform.max()
    # ... and uniform DENSITY, not just matching bounds: the warmup grid must
    # not down-weight off-limb samples beyond r_max (occupancy_at returns 0
    # there; warmup overrides the pdf to exactly uniform)
    r_occ = np.linalg.norm(np.asarray(occ['points']), axis=-1)
    r_ref = np.linalg.norm(np.asarray(ref['points']), axis=-1)
    frac_occ = np.mean(r_occ > CFG.r_max)
    frac_ref = np.mean(r_ref > CFG.r_max)
    assert abs(frac_occ - frac_ref) < 0.05, (
        f'warmup off-limb fraction {frac_occ:.3f} != stratified {frac_ref:.3f}')


def test_occupancy_rejects_non_stratified_sampling():
    """occupancy_sample hardcodes the stratified [near, far] bounds; pairing
    the grid with another sampler would change the integration domain — the
    Renderer must reject it at construction (ADVICE r2)."""
    import pytest

    from sunerf_tpu.systems import make_thomson_system
    with pytest.raises(ValueError, match='stratified'):
        make_thomson_system(sampling='spherical',
                            occupancy={'enabled': True, 'nr': 8, 'ntheta': 4,
                                       'nphi': 8})


def test_training_step_with_occupancy_grid():
    """The grid rides in params as zero-gradient leaves: one optimizer step
    must leave it untouched, and the loss must stay finite."""
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32, n_freqs=3),
        use_fused=False, n_stratified=8, n_hierarchical=8,
        occupancy={'enabled': True, 'nr': 8, 'ntheta': 4, 'nphi': 6,
                   'n_probe': 8})
    assert renderer.occupancy is not None
    params = init(jax.random.key(0))
    assert 'occupancy' in params
    # make the grid non-trivial so sampling actually reshapes
    params['occupancy']['occ_r'] = params['occupancy']['occ_r'].at[4:].set(0.1)

    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
    state = create_train_state(params, optimizer)
    batch = {
        'rays': jnp.stack([jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (16, 1)),
                           jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (16, 1))],
                          axis=1),
        'time': jnp.zeros((16, 1)),
        'target_image': jnp.full((16, 1), 0.05),
    }
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics['loss']))
    np.testing.assert_array_equal(np.asarray(new_state.params['occupancy']['occ_r']),
                                  np.asarray(params['occupancy']['occ_r']))
    # the MLP itself did move
    assert not np.allclose(np.asarray(new_state.params['fine']['w_in']),
                           np.asarray(params['fine']['w_in']))


def test_spec_roundtrip_with_occupancy():
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import from_spec, make_emission_system

    renderer, _ = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32, n_freqs=3),
        use_fused=False,
        occupancy=OccupancyConfig(nr=16, ntheta=8, nphi=8))
    spec = renderer.spec
    assert spec['render']['occupancy']['nr'] == 16
    import json
    json.dumps(spec)  # must be serializable
    r2, init2 = from_spec(spec, use_fused=False)
    assert r2.occupancy == OccupancyConfig(nr=16, ntheta=8, nphi=8)
    assert 'occupancy' in init2(jax.random.key(0))


def test_analytic_renderers_carry_the_grid(tmp_path):
    """make_simple_star_renderer / make_mhd_renderer with an occupancy config
    must include the grid in their params (regression: the config used to be
    swallowed — the renderer silently fell back to plain stratified sampling
    and the Trainer's grid update KeyError'd mid-run)."""
    import numpy as np

    from sunerf_tpu.data.psi_io import wrhdf_3d
    from sunerf_tpu.models.mhd_field import MHDFieldLoader
    from sunerf_tpu.systems import make_mhd_renderer, make_simple_star_renderer

    occ = OccupancyConfig(nr=8, ntheta=4, nphi=8, n_probe=8)
    renderer, init = make_simple_star_renderer(occupancy=occ)
    assert 'occupancy' in init()

    r = np.linspace(1.0, 1.3, 4)
    th = np.linspace(0.0, np.pi, 5)
    ph = np.linspace(0.0, 2 * np.pi, 6)
    cube = np.ones((6, 5, 4), np.float32)
    for var in ('rho', 't'):
        d = tmp_path / var
        d.mkdir()
        wrhdf_3d(str(d / f'{var}00100.h5'), r, th, ph, cube)
    renderer, params = make_mhd_renderer(MHDFieldLoader(str(tmp_path)),
                                         occupancy=occ)
    assert 'occupancy' in params


def test_spec_roundtrip_with_tiers_and_proposal():
    """tier_fraction/tier_samples + a proposal coarse field survive the
    save_state spec roundtrip; the reconstructed renderer evals untiered
    (tier_eval defaults False) with the small coarse architecture intact."""
    import json

    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import from_spec, make_emission_system

    renderer, _ = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32, n_freqs=3),
        coarse_config=emission_config(n_layers=2, d_filter=16, n_freqs=3),
        use_fused=False, tier_fraction=0.5, tier_samples=8)
    spec = renderer.spec
    json.dumps(spec)
    r2, init2 = from_spec(spec, use_fused=False)
    assert r2.tier_fraction == 0.5 and r2.tier_samples == 8
    assert r2.tier_eval is False
    assert r2.coarse_field_apply is not None
    p = init2(jax.random.key(0))
    assert p['coarse']['w_in'].shape != p['fine']['w_in'].shape
