"""Multi-chip sharding tests on the 8-device virtual CPU mesh: sharded and
single-device training must agree numerically; rendering tiles across chips."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply
from sunerf_tpu.parallel.mesh import (global_batch_size, make_mesh,
                                      replicate, shard_batch)
from sunerf_tpu.rendering.emission import EmissionHead
from sunerf_tpu.rendering.renderer import Renderer
from sunerf_tpu.train.objective import LossConfig
from sunerf_tpu.train.optim import OptimConfig, make_optimizer
from sunerf_tpu.train.step import (create_train_state, make_eval_step,
                                   make_train_step)


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


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_train_step_matches_single_device():
    renderer, params, batch = _setup(n_rays=64)
    loss_config = LossConfig()
    optimizer = make_optimizer(OptimConfig())
    key = jax.random.key(11)

    # single device
    step1 = make_train_step(renderer, loss_config, optimizer, donate=False)
    state1 = create_train_state(params, optimizer)
    state1, m1 = step1(state1, batch, key)

    # 8-device mesh
    mesh = make_mesh()
    step8 = make_train_step(renderer, loss_config, optimizer, mesh=mesh,
                            donate=False)
    state8 = create_train_state(params, optimizer)
    state8 = jax.tree.map(lambda x: x, state8)
    state8 = replicate(mesh, state8)
    sharded = shard_batch(mesh, batch)
    state8, m8 = step8(state8, sharded, key)

    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']), rtol=1e-5)
    # shard-wise pmean reassociates the batch reduction: tiny fp drift expected
    for l1, l8 in zip(jax.tree.leaves(state1.params), jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l8),
                                   rtol=5e-3, atol=1e-5)


def test_sharded_multi_step_training_runs():
    renderer, params, batch = _setup(n_rays=128)
    mesh = make_mesh()
    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer, mesh=mesh)
    state = replicate(mesh, create_train_state(params, optimizer))
    sharded = shard_batch(mesh, batch)
    key = jax.random.key(0)
    for _ in range(3):
        state, metrics = step(state, sharded, key)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.step) == 3


def test_sharded_eval_matches_single_device():
    renderer, params, batch = _setup(n_rays=64)
    mesh = make_mesh()
    single = make_eval_step(renderer)
    sharded = make_eval_step(renderer, mesh=mesh)
    out1 = single(params, batch)
    out8 = sharded(replicate(mesh, params), shard_batch(mesh, batch))
    np.testing.assert_allclose(np.asarray(out1['image']),
                               np.asarray(out8['image']), rtol=1e-5, atol=1e-7)


def test_global_batch_size():
    mesh = make_mesh()
    assert global_batch_size(1024, mesh) == 8192


def test_trainer_mesh_validation_and_diagnostics(tmp_path):
    """Trainer on the 8-device mesh: the held-out render goes through the
    sharded eval path (all chips, not 1), the pre-training sanity validation
    runs at step 0 (reference num_sanity_val_steps=-1, run_emission.py:70),
    and the fit-start diagnostics (pose overview, ray-sampling plot;
    reference callback.py:92-256) land in the workdir."""
    import json
    import os

    from sunerf_tpu.data.datasets import ArrayDataset
    from sunerf_tpu.data.loaders import RayData
    from sunerf_tpu.train.loop import Trainer, TrainerConfig

    renderer, params, batch = _setup(n_rays=128)
    train_ds = ArrayDataset({k: np.asarray(v) for k, v in batch.items()},
                            batch_size=64)
    valid = {k: np.asarray(v)[:64] for k, v in batch.items()}
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[:, 0, 3] = [4.0, 0.0, -4.0]
    data = RayData(train=train_ds,
                   valid=ArrayDataset(valid, batch_size=64),
                   config={'type': 'emission'}, ref_time=None,
                   validation_shape=(8, 8),
                   extras={'overview': {
                       'poses': poses,
                       'times': np.asarray([0.0, 0.5, 1.0], np.float32),
                       'images': [np.ones((8, 8), np.float32)] * 2}})

    workdir = str(tmp_path / 'run')
    trainer = Trainer(renderer, params, data,
                      loss_config=LossConfig(lambda_regularization=0.0),
                      trainer_config=TrainerConfig(total_steps=2, val_every=10,
                                                   checkpoint_every=10,
                                                   log_every=1),
                      workdir=workdir, mesh=make_mesh())
    trainer.fit()

    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    sanity = [r for r in recs if 'val_psnr' in r and r['step'] == 0]
    assert sanity, 'no step-0 sanity validation'
    assert os.path.exists(os.path.join(workdir, 'overview.jpg'))
    assert os.path.exists(os.path.join(workdir, 'ray_sampling.jpg'))
    assert os.path.exists(os.path.join(workdir, 'val_00000000_ch0.jpg'))


def test_sharded_tiered_train_step_runs():
    """Adaptive per-ray budgets under shard_map: the per-shard argsort
    partition + one-hot permutations must compile and train on the mesh
    with a finite loss and moving params."""
    config = emission_config(n_layers=2, d_filter=32)
    renderer = Renderer(field_apply=functools.partial(nerf_apply, config),
                        head=EmissionHead(), n_stratified=8,
                        n_hierarchical=8, perturb=False,
                        tier_fraction=0.5, tier_samples=4)
    k1, k2 = jax.random.split(jax.random.key(0))
    params = {'coarse': init_nerf(k1, config), 'fine': init_nerf(k2, config)}
    key = jax.random.key(5)
    n_rays = 64
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n_rays, 1))
    dirs = jnp.array([[-1.0, 0.0, 0.0]]) + 0.1 * jax.random.normal(
        key, (n_rays, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((n_rays, 1)),
             'target_image': jnp.full((n_rays, 1), 0.05)}

    mesh = make_mesh()
    optimizer = make_optimizer(OptimConfig())
    step = make_train_step(renderer, LossConfig(), optimizer, mesh=mesh,
                           donate=False)
    state = replicate(mesh, create_train_state(params, optimizer))
    sbatch = shard_batch(mesh, batch)
    before = np.asarray(state.params['fine']['w_in'])
    for _ in range(2):
        state, metrics = step(state, sbatch, jax.random.key(3))
    assert np.isfinite(float(metrics['loss']))
    assert not np.array_equal(before, np.asarray(state.params['fine']['w_in']))


def test_sharded_dt_train_step_matches_single_device():
    """DT head under shard_map (VERDICT r4 #5): multi-wavelength batch with
    an absent channel (wavelength 0 mask), response-table lookup, and the
    per-lambda aux params (log_abs, vol_c) — sharded loss must match the
    single-device step and the aux params must receive gradient. Replaces
    the reference's untested strategy='dp' DT path
    (run_density_temperature.py:79-84)."""
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import make_density_temperature_system

    renderer, init = make_density_temperature_system(
        model_config=density_temperature_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8, perturb=False)
    params = init(jax.random.key(0))
    n_rays = 64
    key = jax.random.key(5)
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n_rays, 1))
    dirs = jnp.array([[-1.0, 0.0, 0.0]]) + 0.1 * jax.random.normal(
        key, (n_rays, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    wl = jnp.tile(jnp.asarray([[171.0, 193.0, 211.0]], jnp.float32),
                  (n_rays, 1))
    wl = wl.at[n_rays // 2:, 2].set(0.0)  # union-lambda mask: channel absent
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((n_rays, 1)),
             'target_image': jnp.full((n_rays, 3), 0.05),
             'wavelength': wl}

    loss_config = LossConfig(image_scaling='none')
    optimizer = make_optimizer(OptimConfig())
    key = jax.random.key(11)

    step1 = make_train_step(renderer, loss_config, optimizer, donate=False)
    state1 = create_train_state(params, optimizer)
    state1, m1 = step1(state1, batch, key)

    mesh = make_mesh()
    step8 = make_train_step(renderer, loss_config, optimizer, mesh=mesh,
                            donate=False)
    state8 = replicate(mesh, create_train_state(params, optimizer))
    state8, m8 = step8(state8, shard_batch(mesh, batch), key)

    np.testing.assert_allclose(float(m1['loss']), float(m8['loss']),
                               rtol=1e-5)
    for la in (state1, state8):
        assert not np.array_equal(np.asarray(la.params['fine']['log_abs']),
                                  np.asarray(params['fine']['log_abs'])), \
            'per-lambda log_abs did not train'
    np.testing.assert_allclose(np.asarray(state1.params['fine']['log_abs']),
                               np.asarray(state8.params['fine']['log_abs']),
                               rtol=5e-3, atol=1e-6)


def test_initialize_multihost_explicit_args_raise(monkeypatch):
    """Explicit coordinator args + failed init must RAISE (VERDICT r3 #6):
    a misconfigured pod must not silently degrade to single-host."""
    import pytest

    from sunerf_tpu.parallel import mesh as mesh_mod

    def boom(**kwargs):
        raise ValueError('coordinator unreachable')

    monkeypatch.setattr(jax.distributed, 'initialize', boom)
    with pytest.raises(RuntimeError, match='explicit coordinator args'):
        mesh_mod.initialize_multihost(coordinator_address='10.0.0.1:1234',
                                      num_processes=4, process_id=0)


def test_initialize_multihost_autodetect_warns(monkeypatch):
    """No-arg auto-detect failure is the normal single-host path: warn,
    don't raise."""
    import pytest

    from sunerf_tpu.parallel import mesh as mesh_mod

    def boom(**kwargs):
        raise ValueError('no TPU metadata server')

    monkeypatch.setattr(jax.distributed, 'initialize', boom)
    with pytest.warns(RuntimeWarning, match='continuing single-host'):
        mesh_mod.initialize_multihost()


def test_initialize_multihost_success_path(monkeypatch):
    """A successful init passes the args through verbatim."""
    from sunerf_tpu.parallel import mesh as mesh_mod

    seen = {}

    def fake_init(**kwargs):
        seen.update(kwargs)

    monkeypatch.setattr(jax.distributed, 'initialize', fake_init)
    mesh_mod.initialize_multihost(coordinator_address='host:99',
                                  num_processes=2, process_id=1)
    assert seen == {'coordinator_address': 'host:99', 'num_processes': 2,
                    'process_id': 1}
