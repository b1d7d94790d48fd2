"""Gradient microbatching and mesh-tiled evaluation rendering."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply
from sunerf_tpu.parallel.mesh import make_mesh, replicate
from sunerf_tpu.rendering.emission import EmissionHead
from sunerf_tpu.rendering.renderer import Renderer
from sunerf_tpu.train.objective import LossConfig
from sunerf_tpu.train.optim import make_optimizer
from sunerf_tpu.train.step import create_train_state, make_train_step


def _setup(n_rays):
    config = emission_config(n_layers=2, d_filter=32)
    renderer = Renderer(field_apply=functools.partial(nerf_apply, config),
                        head=EmissionHead(), n_stratified=8, n_hierarchical=8,
                        perturb=False)
    k1, k2 = jax.random.split(jax.random.key(0))
    params = {'coarse': init_nerf(k1, config), 'fine': init_nerf(k2, config)}
    key = jax.random.key(5)
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n_rays, 1))
    dirs = jnp.array([[-1.0, 0.0, 0.0]]) + 0.1 * jax.random.normal(key, (n_rays, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((n_rays, 1)),
             'target_image': jnp.full((n_rays, 1), 0.05)}
    return renderer, params, batch


def test_microbatched_step_matches_full():
    renderer, params, batch = _setup(64)
    optimizer = make_optimizer()
    loss_config = LossConfig()
    full = make_train_step(renderer, loss_config, optimizer, donate=False)
    micro = make_train_step(renderer, loss_config, optimizer, donate=False,
                            microbatch=16)
    s_full = create_train_state(params, optimizer)
    s_micro = create_train_state(params, optimizer)
    key = jax.random.key(3)
    s_full, m_full = full(s_full, batch, key)
    s_micro, m_micro = micro(s_micro, batch, key)
    # per-chunk mean of means == full mean for equal chunk sizes
    np.testing.assert_allclose(float(m_full['loss']), float(m_micro['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_micro.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=1e-5)


def test_microbatched_sharded_runs():
    renderer, params, batch = _setup(128)
    mesh = make_mesh()
    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer, mesh=mesh,
                           microbatch=8)
    from sunerf_tpu.parallel.mesh import shard_batch
    state = replicate(mesh, create_train_state(params, optimizer))
    state, metrics = step(state, shard_batch(mesh, batch), jax.random.key(0))
    assert np.isfinite(float(metrics['loss']))


def test_mesh_tiled_model_loader():
    from sunerf_tpu.evaluation.loader import ModelLoader
    renderer, params, _ = _setup(8)
    mesh = make_mesh()
    single = ModelLoader(renderer, params, batch_size=128)
    tiled = ModelLoader(renderer, params, batch_size=128, mesh=mesh)
    v1 = single.render_observer_image(0.1, 0.5, 0.0, 215.0, resolution=16)
    v8 = tiled.render_observer_image(0.1, 0.5, 0.0, 215.0, resolution=16)
    np.testing.assert_allclose(v1.image, v8.image, rtol=1e-5, atol=1e-7)


def test_load_map_stack(tmp_path):
    from datetime import datetime
    from sunerf_tpu.data.fits import write_fits
    from sunerf_tpu.data.loaders import load_map_stack
    from sunerf_tpu.data.wcs import observer_header
    paths = []
    for wl, val in ((171, 4300.0), (193, 9800.0)):
        h = observer_header(0, 0, 215.0, datetime(2012, 1, 1), 8, float(wl))
        p = str(tmp_path / f'{wl}.fits')
        write_fits(p, np.full((8, 8), val, np.float32), h)
        paths.append(p)
    stack = load_map_stack(paths, apply_norm=True)
    assert stack.shape == (2, 8, 8)
    np.testing.assert_allclose(stack[0], 0.5, rtol=1e-5)  # 4300/8600
    np.testing.assert_allclose(stack[1], 1.0, rtol=1e-5)
