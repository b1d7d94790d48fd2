"""Fused Pallas MLP kernel vs the pure-JAX reference path (interpret mode on
CPU; the real kernel is exercised on TPU by bench.py and __graft_entry__)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunerf_tpu.models.fields import (density_temperature_config,
                                      emission_config, init_nerf, nerf_apply,
                                      nerf_apply_fused)
from sunerf_tpu.ops.pallas.fused_mlp import fast_cos, fast_sin

TINY = dict(n_layers=3, d_filter=64, n_freqs=4)


def test_fast_sin_accuracy():
    x = jnp.linspace(-100.0, 100.0, 20001)
    err = float(jnp.max(jnp.abs(fast_sin(x) - jnp.sin(x))))
    assert err < 5e-5, err
    err_c = float(jnp.max(jnp.abs(fast_cos(x) - jnp.cos(x))))
    assert err_c < 5e-5, err_c


def test_fused_forward_matches_reference():
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (50, 4))
    ref = nerf_apply(config, params, pts).raw
    fused = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                             interpret=True).raw
    # bf16 matmuls: ~0.5% relative agreement expected
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 0.01 * scale + 1e-4


@pytest.mark.parametrize('n_layers,d_filter', [(6, 384), (4, 256), (4, 128)])
def test_fused_parity_at_production_arch_shapes(n_layers, d_filter):
    """The architecture dial (RESULTS.md arch axis) ships 6x384/4x256 fine
    fields and the 4x128 proposal coarse field through the same fused kernel
    — pin forward AND gradient parity at those exact shapes."""
    config = emission_config(n_layers=n_layers, d_filter=d_filter)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (48, 4))

    ref = nerf_apply(config, params, pts).raw
    fused = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                             interpret=True).raw
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 0.01 * scale + 1e-4

    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        nerf_apply_fused(config, p, pts, tile=16, bwd_tile=16,
                         interpret=True).raw ** 2))(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fused[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.03, f'{k}: {rel}'


def test_fused_gradients_match_reference():
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (40, 4))

    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        nerf_apply_fused(config, p, pts, tile=16, bwd_tile=16,
                         interpret=True).raw ** 2))(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fused[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.03, f'{k}: {rel}'


def test_fused_point_gradients():
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (24, 4))
    gp_ref = jax.grad(lambda x: jnp.mean(nerf_apply(config, params, x).raw ** 2))(pts)
    gp_fused = jax.grad(lambda x: jnp.mean(
        nerf_apply_fused(config, params, x, tile=8, bwd_tile=8,
                         interpret=True).raw ** 2))(pts)
    rel = float(jnp.max(jnp.abs(gp_ref - gp_fused)) / (jnp.max(jnp.abs(gp_ref)) + 1e-12))
    assert rel < 0.05, rel


def test_fused_handles_non_tile_multiple():
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (37, 4))  # not a tile multiple
    out = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                           interpret=True).raw
    assert out.shape == (37, 2)
    ref = nerf_apply(config, params, pts).raw
    assert float(jnp.max(jnp.abs(out - ref))) < 0.01 * float(jnp.max(jnp.abs(ref))) + 1e-4


def test_fused_stash_path_matches_reference():
    """The activation-stashing backward (the TPU training default) in
    interpret mode on a tiny problem."""
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (24, 4))
    from sunerf_tpu.ops.pallas.fused_mlp import fused_nerf_raw
    mlp = {k: params[k] for k in ('w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out')}
    out = fused_nerf_raw(config, params, pts, interpret=True, stash=True,
                         stash_tile=8, stash_bwd_tile=8)
    ref = nerf_apply(config, params, pts).raw
    assert float(jnp.max(jnp.abs(out - ref))) < 0.01 * float(jnp.max(jnp.abs(ref))) + 1e-4
    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_st = jax.grad(lambda p: jnp.mean(fused_nerf_raw(
        config, p, pts, interpret=True, stash=True, stash_tile=8,
        stash_bwd_tile=8) ** 2))(mlp)
    for k in g_st:
        a, b = np.asarray(g_ref[k]), np.asarray(g_st[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.03, f'{k}: {rel}'


def test_fused_stash_lsb_matches_reference():
    """The single-stream LSB stash (sign(cos) packed in the sin mantissa LSB,
    cos reconstructed as sign*sqrt(1-sin^2)) in interpret mode."""
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (24, 4))
    from sunerf_tpu.ops.pallas.fused_mlp import fused_nerf_raw
    mlp = {k: params[k] for k in ('w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out')}
    out = fused_nerf_raw(config, params, pts, interpret=True, stash=True,
                         stash_tile=8, stash_bwd_tile=8, stash_format='lsb')
    ref = nerf_apply(config, params, pts).raw
    assert float(jnp.max(jnp.abs(out - ref))) < 0.01 * float(jnp.max(jnp.abs(ref))) + 1e-4
    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_st = jax.grad(lambda p: jnp.mean(fused_nerf_raw(
        config, p, pts, interpret=True, stash=True, stash_tile=8,
        stash_bwd_tile=8, stash_format='lsb') ** 2))(mlp)
    for k in g_st:
        a, b = np.asarray(g_ref[k]), np.asarray(g_st[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.04, f'{k}: {rel}'


def test_fused_stash_i8pair_matches_reference():
    """The single-stream paired-int8 stash (sin and cos both int8 in one
    stream; dW matmuls run on the int8 MXU path) in interpret mode."""
    config = emission_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (24, 4))
    from sunerf_tpu.ops.pallas.fused_mlp import fused_nerf_raw
    mlp = {k: params[k] for k in ('w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out')}
    out = fused_nerf_raw(config, params, pts, interpret=True, stash=True,
                         stash_tile=8, stash_bwd_tile=8, stash_format='i8pair')
    ref = nerf_apply(config, params, pts).raw
    assert float(jnp.max(jnp.abs(out - ref))) < 0.01 * float(jnp.max(jnp.abs(ref))) + 1e-4
    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_st = jax.grad(lambda p: jnp.mean(fused_nerf_raw(
        config, p, pts, interpret=True, stash=True, stash_tile=8,
        stash_bwd_tile=8, stash_format='i8pair') ** 2))(mlp)
    for k in g_st:
        a, b = np.asarray(g_ref[k]), np.asarray(g_st[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        # int8-quantized sin/dz operands: coarser than the bf16 paths
        assert rel < 0.06, f'{k}: {rel}'


def test_pack_unpack_sin_csign():
    """Round-trip of the LSB packing: sin within 1 ulp, cos sign exact,
    reconstructed cos within ~1% absolute away from the |cos|~0 singularity."""
    from sunerf_tpu.ops.pallas.fused_mlp import (_pack_sin_csign,
                                                 _unpack_sin_cos,
                                                 fast_sin_csign)
    z = jnp.linspace(-30.0, 30.0, 4097).reshape(-1, 1)
    s, negc = fast_sin_csign(z)
    packed = _pack_sin_csign(s.astype(jnp.bfloat16), negc)
    s2, c2 = _unpack_sin_cos(packed)
    assert float(jnp.max(jnp.abs(s2.astype(jnp.float32) - s))) < 0.01
    ctrue = np.cos(np.asarray(z, np.float64))
    c2 = np.asarray(c2, np.float64)
    # reconstruction profile: |cos| <~ 0.09 is a dead zone (bf16 sin rounds
    # to 1.0 there, so cos reconstructs as +-0); outside it the sign is exact
    mask = np.abs(ctrue) > 0.1
    assert np.all((c2[mask] != 0) & (np.sign(c2[mask]) == np.sign(ctrue[mask])))
    # absolute error ~ 1.5*ulp(sin) * |sin/cos| (bf16 round + LSB corruption)
    mask = np.abs(ctrue) > 0.15
    assert float(np.max(np.abs(c2[mask] - ctrue[mask]))) < 0.045
    mask = np.abs(ctrue) > 0.5
    assert float(np.max(np.abs(c2[mask] - ctrue[mask]))) < 0.015
    # inside the dead zone the reconstruction is small (never wild)
    dead = np.abs(ctrue) < 0.09
    assert float(np.max(np.abs(c2[dead]))) < 0.2


def test_fused_dt_config_aux_passthrough():
    config = density_temperature_config(**TINY)
    params = init_nerf(jax.random.key(0), config)
    pts = jax.random.normal(jax.random.key(1), (16, 4))
    out = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                           interpret=True)
    assert out.log_abs is not None and out.vol_c is not None
    # base offsets applied
    ref = nerf_apply(config, params, pts)
    assert float(jnp.max(jnp.abs(out.raw - ref.raw))) < 0.05


def test_fused_grid_forward_matches_reference():
    """Grid-encoding configs: in-kernel separable contraction vs the XLA
    path (ops/grid_encoding.py) — plain forward."""
    config = emission_config(n_layers=3, d_filter=64, n_freqs=4,
                             grid_sizes=(8, 16), grid_features=8)
    params = init_nerf(jax.random.key(0), config)
    # make the freshly-initialized (1e-4) tables carry real signal
    params['grid_0'] = params['grid_0'] * 1e4
    params['grid_1'] = params['grid_1'] * 1e4
    pts = jax.random.uniform(jax.random.key(1), (50, 4),
                             minval=-1.5, maxval=1.5)
    ref = nerf_apply(config, params, pts).raw
    fused = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                             interpret=True).raw
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 0.01 * scale + 1e-4


def test_fused_grid_gradients_match_reference():
    """Stashing backward with d_table accumulation vs XLA autodiff."""
    config = emission_config(n_layers=3, d_filter=64, n_freqs=4,
                             grid_sizes=(8,), grid_features=8)
    params = init_nerf(jax.random.key(0), config)
    params['grid_0'] = params['grid_0'] * 1e4
    pts = jax.random.uniform(jax.random.key(1), (48, 4),
                             minval=-1.5, maxval=1.5)

    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        nerf_apply_fused(config, p, pts, stash=True, stash_tile=16,
                         stash_bwd_tile=16, interpret=True,
                         compute_dpts=False).raw ** 2))(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fused[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.03, f'{k}: {rel}'


def test_fused_grid_hat_mxu_matches_reference():
    """grid_hat_mxu=True (constant-expansion MXU hat build) is numerics-
    equivalent to the XLA path for both forward and the stashing backward
    (same tolerance as the default iota build)."""
    config = emission_config(n_layers=3, d_filter=64, n_freqs=4,
                             grid_sizes=(8, 16), grid_features=8,
                             grid_hat_mxu=True)
    params = init_nerf(jax.random.key(0), config)
    params['grid_0'] = params['grid_0'] * 1e4
    params['grid_1'] = params['grid_1'] * 1e4
    pts = jax.random.uniform(jax.random.key(1), (48, 4),
                             minval=-1.5, maxval=1.5)
    ref = nerf_apply(config, params, pts).raw
    fused = nerf_apply_fused(config, params, pts, tile=16, bwd_tile=16,
                             interpret=True).raw
    scale = float(jnp.max(jnp.abs(ref)))
    assert float(jnp.max(jnp.abs(ref - fused))) < 0.01 * scale + 1e-4

    g_ref = jax.grad(lambda p: jnp.mean(nerf_apply(config, p, pts).raw ** 2))(params)
    g_fused = jax.grad(lambda p: jnp.mean(
        nerf_apply_fused(config, p, pts, stash=True, stash_tile=16,
                         stash_bwd_tile=16, interpret=True,
                         compute_dpts=False).raw ** 2))(params)
    for k in g_ref:
        a, b = np.asarray(g_ref[k]), np.asarray(g_fused[k])
        rel = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12)
        assert rel < 0.03, f'{k}: {rel}'


def test_fused_grid_guards():
    """Unsupported combinations fail loudly, not wrongly."""
    config = emission_config(n_layers=2, d_filter=32, n_freqs=2,
                             grid_sizes=(8,), grid_features=4)
    params = init_nerf(jax.random.key(0), config)
    pts = jnp.zeros((8, 4))
    with pytest.raises(NotImplementedError):
        nerf_apply_fused(config, params, pts, interpret=True,
                         stash=True, stash_format='lsb')
    # recompute backward has no d_table path
    with pytest.raises(NotImplementedError):
        jax.grad(lambda p: jnp.mean(nerf_apply_fused(
            config, p, pts, stash=False, tile=8, bwd_tile=8,
            interpret=True).raw ** 2))(params)
    # point cotangents are not implemented for grid configs
    with pytest.raises(NotImplementedError):
        jax.grad(lambda p: jnp.mean(nerf_apply_fused(
            config, p, pts, stash=True, stash_tile=8, stash_bwd_tile=8,
            interpret=True, compute_dpts=True).raw ** 2))(params)
