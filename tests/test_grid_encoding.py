"""Feature-grid encoding: the separable one-hot contraction
(ops/grid_encoding.py) pinned against a gather-based trilinear oracle, its
gradients, and the grid-config field integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunerf_tpu.models.fields import NeRFConfig, emission_config, init_nerf, \
    nerf_apply
from sunerf_tpu.ops.grid_encoding import grid_encode, grid_encode_ref, \
    grid_table_init

HI = jax.lax.Precision.HIGHEST


@pytest.mark.parametrize('grid_size,features', [(8, 4), (16, 8), (5, 2)])
def test_matches_trilinear_oracle(grid_size, features):
    key = jax.random.key(0)
    table = jax.random.normal(key, (grid_size, grid_size, grid_size, features))
    pts = jax.random.uniform(jax.random.key(1), (257, 3),
                             minval=-2.0, maxval=2.0)
    got = grid_encode(table, pts, bound=2.0, precision=HI)
    want = grid_encode_ref(table, pts, bound=2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_cell_centers_return_table_values():
    g, f = 6, 3
    table = jax.random.normal(jax.random.key(2), (g, g, g, f))
    # world coords of cell (ix, iy, iz): u = i  ->  p = (2*i/(g-1) - 1)*bound
    idx = jnp.array([[0, 0, 0], [2, 3, 1], [5, 5, 5]])
    pts = (idx / (g - 1) * 2.0 - 1.0) * 1.5
    got = grid_encode(table, pts, bound=1.5, precision=HI)
    want = table[idx[:, 1], idx[:, 2], idx[:, 0]]  # table order (y, z, x, f)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_out_of_bounds_clamps_to_boundary():
    g, f = 8, 4
    table = jax.random.normal(jax.random.key(3), (g, g, g, f))
    inside = jnp.array([[1.0, -1.0, 1.0]]) * 2.0       # exactly the corner
    outside = jnp.array([[7.0, -9.0, 3.0]])            # far past it
    a = grid_encode(table, inside, bound=2.0, precision=HI)
    b = grid_encode(table, outside, bound=2.0, precision=HI)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_chunked_sweep_matches_single_block():
    table = grid_table_init(jax.random.key(4), 12, 4, scale=1.0)
    pts = jax.random.uniform(jax.random.key(5), (1000, 3),
                             minval=-2.0, maxval=2.0)
    full = grid_encode(table, pts, precision=HI, chunk=None)
    chunked = grid_encode(table, pts, precision=HI, chunk=256)
    np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-7)


def test_extra_input_columns_ignored():
    """4-D (x,y,z,t) points: the grid uses the spatial columns only."""
    table = grid_table_init(jax.random.key(6), 8, 4, scale=1.0)
    pts3 = jax.random.uniform(jax.random.key(7), (64, 3), minval=-1, maxval=1)
    pts4 = jnp.concatenate([pts3, jnp.ones((64, 1))], axis=-1)
    np.testing.assert_allclose(grid_encode(table, pts3, precision=HI),
                               grid_encode(table, pts4, precision=HI))


def test_table_gradient_matches_oracle():
    g, f = 6, 3
    table = jax.random.normal(jax.random.key(8), (g, g, g, f))
    pts = jax.random.uniform(jax.random.key(9), (97, 3), minval=-2, maxval=2)
    cot = jax.random.normal(jax.random.key(10), (97, f))

    def loss(fn, t):
        return jnp.sum(fn(t, pts, 2.0) * cot)

    got = jax.grad(lambda t: loss(
        lambda t_, p, b: grid_encode(t_, p, bound=b, precision=HI), table))(table)
    want = jax.grad(lambda t: loss(grid_encode_ref, table))(table)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_point_gradient_finite_difference():
    table = jax.random.normal(jax.random.key(11), (8, 8, 8, 2))
    p0 = jnp.array([[0.31, -0.42, 0.77]])

    def f(p):
        return jnp.sum(grid_encode(table, p, bound=2.0, precision=HI))

    g_auto = jax.grad(f)(p0)
    eps = 1e-3
    for d in range(3):
        dp = jnp.zeros_like(p0).at[0, d].set(eps)
        g_fd = (f(p0 + dp) - f(p0 - dp)) / (2 * eps)
        np.testing.assert_allclose(g_auto[0, d], g_fd, rtol=1e-3, atol=1e-4)


# ------------------------------------------------------- field integration

def test_grid_config_encoded_dim_and_init():
    config = emission_config(n_layers=3, d_filter=64, grid_sizes=(8, 16),
                             grid_features=4)
    base = emission_config(n_layers=3, d_filter=64)
    assert config.d_encoded == base.d_encoded + 8
    params = init_nerf(jax.random.key(0), config)
    assert params['grid_0'].shape == (8, 8, 8, 4)
    assert params['grid_1'].shape == (16, 16, 16, 4)
    assert params['w_in'].shape == (config.d_encoded, 64)
    # NGP-style tiny init
    assert float(jnp.max(jnp.abs(params['grid_0']))) <= 1e-4
    # every param draws from its OWN key: adding grid levels must not
    # perturb the MLP layer inits (w_out once aliased the last grid key),
    # so the output layer matches the grid-free init bit-for-bit
    base_params = init_nerf(jax.random.key(0), base)
    for k in ('w_out', 'b_out', 'w_h', 'b_h'):
        assert np.array_equal(np.asarray(params[k]), np.asarray(base_params[k])), k


def test_grid_field_apply_and_gradients_flow():
    config = emission_config(n_layers=3, d_filter=64, grid_sizes=(8,),
                             grid_features=4, precision='highest')
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.uniform(jax.random.key(1), (32, 4), minval=-1, maxval=1)
    out = nerf_apply(config, params, pts)
    assert out.raw.shape == (32, 2)

    g = jax.grad(lambda p: jnp.sum(nerf_apply(config, p, pts).raw ** 2))(params)
    assert float(jnp.max(jnp.abs(g['grid_0']))) > 0.0


def test_grid_sizes_list_coerced_for_spec_roundtrip():
    import dataclasses
    config = emission_config(grid_sizes=[8, 16])
    assert config.grid_sizes == (8, 16)
    hash(config)  # must stay hashable (closed over jit)
    rt = NeRFConfig(**dataclasses.asdict(config))
    assert rt == config


def test_grid_config_routes_to_xla_path():
    from sunerf_tpu.systems import _select_apply
    config = emission_config(n_layers=2, d_filter=32, grid_sizes=(8,))
    apply_fn = _select_apply(config, use_fused=True)
    params = init_nerf(jax.random.key(0), config)
    pts = jnp.zeros((4, 4))
    assert apply_fn(params, pts).raw.shape == (4, 2)  # must not raise


def test_grid_config_deployment_roundtrip(tmp_path):
    """Grid params + spec survive save_state -> SuNeRFLoader (the queue-7
    TPU protocol evaluates grid checkpoints through this exact path)."""
    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.utils.checkpoint import save_state

    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_features=4,
                             grid_bound=1.3)
    renderer, init = make_emission_system(model_config=config,
                                          n_stratified=8, n_hierarchical=8)
    params = init(jax.random.key(0))
    path = str(tmp_path / 'save_state')
    save_state(path, params, {'renderer_spec': renderer.spec,
                              'type': 'emission'})

    loader = SuNeRFLoader(path, batch_size=256)
    assert tuple(loader.renderer.spec['model_config']['grid_sizes']) == (8,)
    view = loader.render_observer_image(lat=0.3, lon=1.0, time=0.0,
                                        distance=215.0, resolution=8)
    assert view.image.shape == (8, 8, 1)
    assert bool(np.all(np.isfinite(view.image)))


def test_grid_composes_with_tiers_and_proposal():
    """Grid fine field + proposal coarse + tiered fine pass — the matrix-row
    combination queue 7 will train."""
    from sunerf_tpu.systems import make_emission_system
    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_features=4, grid_bound=1.3)
    coarse = emission_config(n_layers=2, d_filter=32, n_freqs=4)
    renderer, init = make_emission_system(
        model_config=config, coarse_config=coarse,
        n_stratified=8, n_hierarchical=8,
        tier_fraction=0.5, tier_samples=4)
    params = init(jax.random.key(0))
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (16, 1))
    rays_d = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (16, 1))
    out = renderer(params, rays_o, rays_d, jnp.zeros((16, 1)),
                   key=jax.random.key(1))
    assert bool(jnp.all(jnp.isfinite(out['image'])))


def test_grid_on_proposal_field_only():
    """Grid tables on the PROPOSAL (coarse) field with a plain fine field
    (psi_protocol --grid-coarse, overfit-fix option 3): the coarse field
    only places samples, so table view-overfitting cannot corrupt held-out
    renders. A train step updates the coarse tables (the table-lr path and
    TV loss find them by key name anywhere in the tree), and the plain fine
    field carries no tables."""
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig, table_tv
    from sunerf_tpu.train.optim import OptimConfig, make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    fine = emission_config(n_layers=2, d_filter=32, n_freqs=4)
    coarse = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_features=4, grid_bound=1.3)
    renderer, init = make_emission_system(
        model_config=fine, coarse_config=coarse,
        n_stratified=8, n_hierarchical=8)
    params = init(jax.random.key(0))
    assert 'grid_0' in params['coarse'] and 'grid_0' not in params['fine']
    # the TV prior sees the coarse tables
    assert float(table_tv(params)) > 0.0

    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3,
                                           table_lr_mult=10.0,
                                           adam_eps=1e-15))
    step = make_train_step(renderer,
                           LossConfig(lambda_regularization=0.0,
                                      lambda_table_tv=1e-3),
                           optimizer, donate=False)
    state = create_train_state(params, optimizer)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (16, 1))
    dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
            + 0.05 * jax.random.normal(jax.random.key(2), (16, 3)))
    batch = {'rays': jnp.stack([rays_o,
                                dirs / jnp.linalg.norm(dirs, axis=-1,
                                                       keepdims=True)],
                               axis=1),
             'time': jnp.zeros((16, 1)),
             'target_image': jnp.full((16, 1), 0.05)}
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics['loss']))
    assert 'table_tv' in metrics
    moved = not np.array_equal(np.asarray(state.params['coarse']['grid_0']),
                               np.asarray(new_state.params['coarse']['grid_0']))
    assert moved, 'coarse grid tables did not update'


def test_grid_composes_with_dt_head():
    """Grid-encoded density-temperature field: aux params (log_abs, vol_c)
    coexist with grid tables through the fused path."""
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.models.fields import nerf_apply_fused
    config = density_temperature_config(n_layers=2, d_filter=32, n_freqs=4,
                                        grid_sizes=(8,), grid_features=4)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.uniform(jax.random.key(1), (16, 4), minval=-1, maxval=1)
    ref = nerf_apply(config, params, pts)
    fused = nerf_apply_fused(config, params, pts, tile=8, bwd_tile=8,
                             interpret=True)
    assert fused.log_abs is not None and fused.vol_c is not None
    assert float(jnp.max(jnp.abs(ref.raw - fused.raw))) < 0.05


# ------------------------------------- TensoRF-style VM factorized tables

def _vm_tables(key, g, r):
    kp, kl = jax.random.split(jax.random.key(key))
    planes = jax.random.normal(kp, (3, g, g, r))
    lines = jax.random.normal(kl, (3, g, r))
    return planes, lines


@pytest.mark.parametrize('grid_size,rank', [(8, 4), (16, 8), (5, 2)])
def test_vm_matches_gather_oracle(grid_size, rank):
    from sunerf_tpu.ops.grid_encoding import vm_encode, vm_encode_ref
    planes, lines = _vm_tables(0, grid_size, rank)
    pts = jax.random.uniform(jax.random.key(1), (257, 3),
                             minval=-2.0, maxval=2.0)
    got = vm_encode(planes, lines, pts, bound=2.0, precision=HI)
    want = vm_encode_ref(planes, lines, pts, bound=2.0)
    assert got.shape == (257, 3 * rank)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vm_cell_centers_return_products():
    """At exact cell centers the hats are one-hot: features must equal
    plane[a, b] * line[c] per orientation (axes x=0, y=1, z=2)."""
    from sunerf_tpu.ops.grid_encoding import vm_encode
    g, r = 6, 3
    planes, lines = _vm_tables(2, g, r)
    idx = jnp.array([[0, 0, 0], [2, 3, 1], [5, 5, 5]])
    pts = (idx / (g - 1) * 2.0 - 1.0) * 1.5
    got = vm_encode(planes, lines, pts, bound=1.5, precision=HI)
    ix, iy, iz = idx[:, 0], idx[:, 1], idx[:, 2]
    want = jnp.concatenate([
        planes[0, iy, iz] * lines[0, ix],       # (yz | x)
        planes[1, iz, ix] * lines[1, iy],       # (zx | y)
        planes[2, ix, iy] * lines[2, iz],       # (xy | z)
    ], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vm_chunked_and_extra_columns():
    from sunerf_tpu.ops.grid_encoding import vm_encode
    planes, lines = _vm_tables(3, 12, 4)
    pts = jax.random.uniform(jax.random.key(4), (1000, 3),
                             minval=-2.0, maxval=2.0)
    full = vm_encode(planes, lines, pts, precision=HI, chunk=None)
    chunked = vm_encode(planes, lines, pts, precision=HI, chunk=256)
    np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-7)
    pts4 = jnp.concatenate([pts, jnp.ones((1000, 1))], axis=-1)
    np.testing.assert_allclose(
        vm_encode(planes, lines, pts4, precision=HI), full,
        rtol=1e-6, atol=1e-7)


def test_vm_gradients_match_oracle():
    from sunerf_tpu.ops.grid_encoding import vm_encode, vm_encode_ref
    g, r = 6, 3
    planes, lines = _vm_tables(5, g, r)
    pts = jax.random.uniform(jax.random.key(6), (97, 3), minval=-2, maxval=2)
    cot = jax.random.normal(jax.random.key(7), (97, 3 * r))

    def loss(fn, p, l):
        return jnp.sum(fn(p, l, pts, 2.0) * cot)

    got = jax.grad(lambda p, l: loss(
        lambda p_, l_, pt, b: vm_encode(p_, l_, pt, bound=b, precision=HI),
        p, l), argnums=(0, 1))(planes, lines)
    want = jax.grad(lambda p, l: loss(vm_encode_ref, p, l),
                    argnums=(0, 1))(planes, lines)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_vm_field_integration_and_train_step():
    """grid_rank config: d_encoded grows by 3R per level, init creates
    plane/line leaves, nerf_apply runs, the table-lr recipe and TV prior
    reach the factors, and a train step moves them."""
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig, table_tv
    from sunerf_tpu.train.optim import OptimConfig, make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8, 16), grid_rank=4, grid_bound=1.3)
    base = emission_config(n_layers=2, d_filter=32, n_freqs=4)
    assert config.d_encoded == base.d_encoded + 2 * 3 * 4
    params = init_nerf(jax.random.key(0), config)
    assert params['grid_planes_0'].shape == (3, 8, 8, 4)
    assert params['grid_lines_1'].shape == (3, 16, 4)
    assert 'grid_0' not in params
    pts = jax.random.uniform(jax.random.key(1), (16, 4), minval=-1, maxval=1)
    out = nerf_apply(config, params, pts)
    assert out.raw.shape == (16, 2)
    assert float(table_tv({'fine': params})) > 0.0

    renderer, init = make_emission_system(
        model_config=config, n_stratified=8, n_hierarchical=8)
    sys_params = init(jax.random.key(0))
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3,
                                           table_lr_mult=10.0,
                                           adam_eps=1e-15))
    step = make_train_step(renderer,
                           LossConfig(lambda_regularization=0.0,
                                      lambda_table_tv=1e-3),
                           optimizer, donate=False)
    state = create_train_state(sys_params, optimizer)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (16, 1))
    dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
            + 0.05 * jax.random.normal(jax.random.key(2), (16, 3)))
    batch = {'rays': jnp.stack([rays_o,
                                dirs / jnp.linalg.norm(dirs, axis=-1,
                                                       keepdims=True)],
                               axis=1),
             'time': jnp.zeros((16, 1)),
             'target_image': jnp.full((16, 1), 0.05)}
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics['loss']))
    for leaf in ('grid_planes_0', 'grid_lines_0'):
        moved = not np.array_equal(np.asarray(state.params['fine'][leaf]),
                                   np.asarray(new_state.params['fine'][leaf]))
        assert moved, f'{leaf} did not update'


# ------------------------------- HexPlane-style 4-D (time) factorization

def _vm_time_tables(key, g, t, r):
    kp, kt = jax.random.split(jax.random.key(key))
    planes = jax.random.normal(kp, (3, g, g, r))
    tplanes = jax.random.normal(kt, (3, g, t, r))
    return planes, tplanes


def _pts4(key, n, t_lo=0.0, t_hi=1.0):
    k1, k2 = jax.random.split(jax.random.key(key))
    xyz = jax.random.uniform(k1, (n, 3), minval=-2.0, maxval=2.0)
    t = jax.random.uniform(k2, (n, 1), minval=t_lo, maxval=t_hi)
    return jnp.concatenate([xyz, t], axis=-1)


@pytest.mark.parametrize('grid_size,time_size,rank', [(8, 4, 4), (16, 6, 8),
                                                      (5, 2, 2)])
def test_vm_time_matches_gather_oracle(grid_size, time_size, rank):
    from sunerf_tpu.ops.grid_encoding import vm_encode_time, \
        vm_encode_time_ref
    planes, tplanes = _vm_time_tables(0, grid_size, time_size, rank)
    pts = _pts4(1, 257, t_lo=-0.5, t_hi=1.5)  # includes out-of-range times
    got = vm_encode_time(planes, tplanes, pts, bound=2.0,
                         t_range=(0.0, 1.0), precision=HI)
    want = vm_encode_time_ref(planes, tplanes, pts, bound=2.0,
                              t_range=(0.0, 1.0))
    assert got.shape == (257, 3 * rank)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vm_time_constant_tplane_reduces_to_static_vm():
    """tplanes constant along the time axis == the static vm_encode with
    those rows as lines, at every query time (the time tap interpolates
    between identical rows)."""
    from sunerf_tpu.ops.grid_encoding import vm_encode, vm_encode_time
    g, t, r = 8, 5, 4
    planes, _ = _vm_time_tables(2, g, t, r)
    lines = jax.random.normal(jax.random.key(3), (3, g, r))
    tplanes = jnp.broadcast_to(lines[:, :, None, :], (3, g, t, r))
    pts = _pts4(4, 130)
    got = vm_encode_time(planes, tplanes, pts, bound=2.0,
                         t_range=(0.0, 1.0), precision=HI)
    want = vm_encode(planes, lines, pts, bound=2.0, precision=HI)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vm_time_cell_centers_return_products():
    """At exact spatial AND temporal cell centers the hats are one-hot:
    features must equal plane[a, b] * tplane[c, t] per orientation."""
    from sunerf_tpu.ops.grid_encoding import vm_encode_time
    g, t, r = 6, 4, 3
    planes, tplanes = _vm_time_tables(5, g, t, r)
    idx = jnp.array([[0, 0, 0], [2, 3, 1], [5, 5, 5]])
    tidx = jnp.array([0, 2, 3])
    pts = jnp.concatenate([(idx / (g - 1) * 2.0 - 1.0) * 1.5,
                           (tidx / (t - 1))[:, None]], axis=-1)
    got = vm_encode_time(planes, tplanes, pts, bound=1.5,
                         t_range=(0.0, 1.0), precision=HI)
    ix, iy, iz = idx[:, 0], idx[:, 1], idx[:, 2]
    want = jnp.concatenate([
        planes[0, iy, iz] * tplanes[0, ix, tidx],       # (yz | x t)
        planes[1, iz, ix] * tplanes[1, iy, tidx],       # (zx | y t)
        planes[2, ix, iy] * tplanes[2, iz, tidx],       # (xy | z t)
    ], axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_vm_time_chunked_and_range_clamp():
    from sunerf_tpu.ops.grid_encoding import vm_encode_time
    planes, tplanes = _vm_time_tables(6, 12, 4, 4)
    pts = _pts4(7, 1000, t_lo=2.0, t_hi=6.0)
    full = vm_encode_time(planes, tplanes, pts, t_range=(2.0, 6.0),
                          precision=HI, chunk=None)
    chunked = vm_encode_time(planes, tplanes, pts, t_range=(2.0, 6.0),
                             precision=HI, chunk=256)
    np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-7)
    # times far outside the window clamp to the boundary rows
    at_edge = pts.at[:, 3].set(6.0)
    beyond = pts.at[:, 3].set(50.0)
    np.testing.assert_allclose(
        vm_encode_time(planes, tplanes, at_edge, t_range=(2.0, 6.0),
                       precision=HI),
        vm_encode_time(planes, tplanes, beyond, t_range=(2.0, 6.0),
                       precision=HI), rtol=1e-6)


def test_vm_time_gradients_match_oracle():
    from sunerf_tpu.ops.grid_encoding import vm_encode_time, \
        vm_encode_time_ref
    g, t, r = 6, 4, 3
    planes, tplanes = _vm_time_tables(8, g, t, r)
    pts = _pts4(9, 97)
    cot = jax.random.normal(jax.random.key(10), (97, 3 * r))

    def loss(fn, p, tp):
        return jnp.sum(fn(p, tp, pts) * cot)

    got = jax.grad(lambda p, tp: loss(
        lambda p_, tp_, pt: vm_encode_time(p_, tp_, pt, bound=2.0,
                                           precision=HI),
        p, tp), argnums=(0, 1))(planes, tplanes)
    want = jax.grad(lambda p, tp: loss(
        lambda p_, tp_, pt: vm_encode_time_ref(p_, tp_, pt, bound=2.0),
        p, tp), argnums=(0, 1))(planes, tplanes)
    for a, b in zip(got, want):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_grid_time_field_integration_and_train_step():
    """grid_time config: requires grid_rank, d_encoded unchanged vs static
    VM (3R per level either way), init creates tplane leaves spanning
    grid_time_range, the field responds to the TIME coordinate, the TV
    prior and table-lr recipe reach the tplanes, and a train step moves
    them. Spec round-trips with the list->tuple coercion."""
    import dataclasses
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig, table_tv
    from sunerf_tpu.train.optim import OptimConfig, make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    with pytest.raises(ValueError):
        emission_config(grid_sizes=(8,), grid_time=4)  # no grid_rank

    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_rank=4, grid_time=4,
                             grid_bound=1.3, grid_time_range=(0.0, 2.0),
                             precision='highest')
    static = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_rank=4)
    assert config.d_encoded == static.d_encoded
    params = init_nerf(jax.random.key(0), config)
    assert params['grid_tplanes_0'].shape == (3, 8, 4, 4)
    assert 'grid_lines_0' not in params
    # the field must RESPOND to time through the tables alone: same spatial
    # points at two times differ
    xyz = jax.random.uniform(jax.random.key(1), (16, 3), minval=-1, maxval=1)
    p0 = jnp.concatenate([xyz, jnp.zeros((16, 1))], axis=-1)
    p1 = jnp.concatenate([xyz, jnp.full((16, 1), 2.0)], axis=-1)
    r0, r1 = nerf_apply(config, params, p0), nerf_apply(config, params, p1)
    assert float(jnp.max(jnp.abs(r0.raw - r1.raw))) > 0.0
    assert float(table_tv({'fine': params})) > 0.0

    # spec round trip (JSON turns tuples into lists)
    spec = dataclasses.asdict(config)
    spec['grid_time_range'] = list(spec['grid_time_range'])
    rt = NeRFConfig(**spec)
    assert rt == config and hash(rt) == hash(config)

    renderer, init = make_emission_system(
        model_config=config, n_stratified=8, n_hierarchical=8)
    sys_params = init(jax.random.key(0))
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3,
                                           table_lr_mult=10.0,
                                           adam_eps=1e-15))
    step = make_train_step(renderer,
                           LossConfig(lambda_regularization=0.0,
                                      lambda_table_tv=1e-3),
                           optimizer, donate=False)
    state = create_train_state(sys_params, optimizer)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (16, 1))
    dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
            + 0.05 * jax.random.normal(jax.random.key(2), (16, 3)))
    batch = {'rays': jnp.stack([rays_o,
                                dirs / jnp.linalg.norm(dirs, axis=-1,
                                                       keepdims=True)],
                               axis=1),
             'time': jnp.full((16, 1), 0.7),
             'target_image': jnp.full((16, 1), 0.05)}
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics['loss']))
    moved = not np.array_equal(
        np.asarray(state.params['fine']['grid_tplanes_0']),
        np.asarray(new_state.params['fine']['grid_tplanes_0']))
    assert moved, 'tplanes did not update'


def test_vm_system_falls_back_from_fused_and_round_trips(tmp_path):
    """use_fused=True with grid_rank must select the XLA path (the fused
    kernel has no VM support) and the spec/save_state round trip preserves
    the factorized config."""
    import os
    from sunerf_tpu.evaluation.loader import SuNeRFLoader
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.utils.checkpoint import save_state

    config = emission_config(n_layers=2, d_filter=32, n_freqs=4,
                             grid_sizes=(8,), grid_rank=4, grid_bound=1.3)
    renderer, init = make_emission_system(model_config=config,
                                          n_stratified=8, n_hierarchical=8,
                                          use_fused=True)
    params = init(jax.random.key(0))
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]), (8, 1))
    rays_d = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (8, 1))
    out = renderer(params, rays_o, rays_d, jnp.zeros((8, 1)))
    assert bool(jnp.all(jnp.isfinite(out['image'])))

    bundle = os.path.join(str(tmp_path), 'save_state')
    save_state(bundle, jax.tree.map(np.asarray, params),
               {'renderer_spec': renderer.spec})
    loader = SuNeRFLoader(bundle, batch_size=64)
    assert loader.renderer.spec['model_config']['grid_rank'] == 4
    view = loader.render_observer_image(lat=0.1, lon=0.3, time=0.0,
                                        distance=215.0, resolution=8)
    assert np.all(np.isfinite(view.image))
