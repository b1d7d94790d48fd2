"""Training tests: LR schedule parity, loss assembly, single-device smoke
training (loss decreases on a fixed target), and the genx reader."""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from sunerf_tpu.core.scaling import image_asinh_scaling
from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply
from sunerf_tpu.rendering.emission import EmissionHead
from sunerf_tpu.rendering.renderer import Renderer
from sunerf_tpu.train.objective import LossConfig, render_loss
from sunerf_tpu.train.optim import OptimConfig, lr_schedule, make_optimizer
from sunerf_tpu.train.step import create_train_state, make_train_step


def test_lr_schedule_decay_and_floor():
    """1e-4 -> 1e-5 over 1e6 steps, floored at 5e-5 (sunerf.py:28-40)."""
    sched = lr_schedule(OptimConfig())
    assert np.isclose(float(sched(0)), 1e-4)
    # decays by 10x over 1e6 steps without the floor; floor kicks in at
    # step where 1e-4 * 0.1^(s/1e6) = 5e-5 -> s = 1e6 * log10(2) ~ 301030
    assert float(sched(100_000)) < 1e-4
    assert np.isclose(float(sched(2_000_000)), 5e-5)
    assert np.isclose(float(sched(301_030)), 5e-5, rtol=1e-3)


def test_asinh_scaling_golden():
    img = jnp.array([0.0, 0.005, 1.0])
    out = np.asarray(image_asinh_scaling(img, vmax=1.0, a=0.005))
    norm = np.arcsinh(1 / 0.005)
    np.testing.assert_allclose(out, [0.0, np.arcsinh(1.0) / norm, 1.0],
                               rtol=1e-4, atol=1e-5)


def test_render_loss_assembly():
    config = LossConfig(lambda_image=2.0, lambda_regularization=0.5,
                        image_scaling='none')
    outputs = {'coarse_image': jnp.ones((4, 1)) * 2.0,
               'fine_image': jnp.ones((4, 1)) * 3.0,
               'regularization': jnp.ones((4, 8)) * 0.1}
    target = jnp.ones((4, 1))
    loss, metrics = render_loss(config, outputs, target)
    np.testing.assert_allclose(float(loss), 2.0 * (1.0 + 4.0) + 0.5 * 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(metrics['psnr']),
                               -10 * np.log10(4.0), rtol=1e-5)


def _tiny_setup(n_rays=32):
    config = emission_config(n_layers=2, d_filter=32)
    renderer = Renderer(field_apply=functools.partial(nerf_apply, config),
                        head=EmissionHead(), n_stratified=8, n_hierarchical=8)
    k1, k2 = jax.random.split(jax.random.key(0))
    params = {'coarse': init_nerf(k1, config), 'fine': init_nerf(k2, config)}

    key = jax.random.key(42)
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n_rays, 1))
    dirs = jnp.array([[-1.0, 0.0, 0.0]]) + 0.1 * jax.random.normal(key, (n_rays, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {
        'rays': jnp.stack([rays_o, rays_d], axis=1),
        'time': jnp.zeros((n_rays, 1)),
        'target_image': jnp.full((n_rays, 1), 0.05),
    }
    return renderer, params, batch


def test_train_step_decreases_loss():
    renderer, params, batch = _tiny_setup()
    loss_config = LossConfig(lambda_regularization=0.0)
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(renderer, loss_config, optimizer)
    state = create_train_state(params, optimizer)
    key = jax.random.key(7)

    first = None
    for i in range(30):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics['loss'])
    last = float(metrics['loss'])
    assert last < first * 0.5, f'loss did not decrease: {first} -> {last}'
    assert int(state.step) == 30


def test_train_step_metrics_finite():
    renderer, params, batch = _tiny_setup()
    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer)
    state = create_train_state(params, optimizer)
    state, metrics = step(state, batch, jax.random.key(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_spike_guard_skips_bad_update():
    """With spike_guard on, a batch whose loss exceeds k x the loss EMA rolls
    params and opt_state back to the last healthy snapshot (and leaves the
    EMA unpoisoned); normal batches still update (failure-detection feature;
    absent upstream, SURVEY §5)."""
    renderer, params, batch = _tiny_setup()
    loss_config = LossConfig(lambda_regularization=0.0)
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(renderer, loss_config, optimizer, spike_guard=3.0)
    state = create_train_state(params, optimizer, spike_guard=True)
    key = jax.random.key(7)

    for _ in range(3):
        state, metrics = step(state, batch, key)
    assert float(metrics['update_skipped']) == 0.0
    ema = float(state.loss_ema)
    assert ema > 0

    poisoned = dict(batch, target_image=batch['target_image'] + 1e3)
    before = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, poisoned, key)
    assert float(metrics['update_skipped']) == 1.0
    after = jax.tree.map(np.asarray, state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # the spike's value does not enter the EMA; it only grows by the 5%
    # unlatch factor (see _guarded_update)
    np.testing.assert_allclose(float(state.loss_ema), ema * 1.05, rtol=1e-6)
    assert int(state.step) == 4  # the step counter still advances

    # recovery: the next normal batch updates again
    state, metrics = step(state, batch, key)
    assert float(metrics['update_skipped']) == 0.0


def test_spike_guard_rolls_back_past_ramp_steps():
    """A loss RAMP (each step below the trip factor but above the healthy
    refresh factor) must not poison the snapshot: when the trip finally
    fires, params roll back past ALL ramp steps to the last healthy state —
    the skip-only design froze at already-damaged params (RESULTS.md)."""
    renderer, params, batch = _tiny_setup()
    loss_config = LossConfig(lambda_regularization=0.0)
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(renderer, loss_config, optimizer, spike_guard=3.0)
    state = create_train_state(params, optimizer, spike_guard=True)
    key = jax.random.key(7)

    # 30 steps: loss drops ~20x; the 1%-rate EMA lags well above it, so the
    # probed poison ratios below (vs EMA) are ~1.7x and ~4.7x
    for _ in range(30):
        state, metrics = step(state, batch, key)
    assert float(metrics['update_skipped']) == 0.0
    healthy_params = jax.tree.map(np.asarray, state.params)

    # ramp: loss ~1.7x the EMA (above the 1.5x refresh bar, below the 3x
    # trip bar) -> the update APPLIES (params move) but the snapshot must not
    mild = dict(batch, target_image=batch['target_image'] + 0.5)
    state, metrics = step(state, mild, key)
    assert float(metrics['update_skipped']) == 0.0
    moved = any(not np.array_equal(a, np.asarray(b)) for a, b in zip(
        jax.tree.leaves(healthy_params), jax.tree.leaves(state.params)))
    assert moved, 'ramp step should have applied its update'

    # trip (~4.7x EMA): rollback must land on the PRE-RAMP healthy params
    poisoned = dict(batch, target_image=batch['target_image'] + 3.0)
    trips_before = int(state.trip_count)
    state, metrics = step(state, poisoned, key)
    assert float(metrics['update_skipped']) == 1.0
    for a, b in zip(jax.tree.leaves(healthy_params),
                    jax.tree.leaves(jax.tree.map(np.asarray, state.params))):
        np.testing.assert_array_equal(a, b)
    # the cumulative device-state counter makes trips between log points
    # visible (VERDICT r2 #7): it must increment across the forced trip and
    # ride along in metrics as a monotone value
    assert int(state.trip_count) == trips_before + 1
    assert float(metrics['spike_trips']) == trips_before + 1
    state, metrics = step(state, batch, key)
    assert int(state.trip_count) == trips_before + 1  # healthy step: no change


def test_spike_guard_unlatches_after_regime_shift():
    """A PERSISTENT loss-level shift (e.g. high inter-batch variance scenes:
    the DT multi-thermal ablation tripped 2980/3000 steps and never trained,
    DT_ABLATION_r3) must not latch the guard shut: the EMA grows 5% on each
    tripped step, so consecutive trips unlatch in O(log(ratio)/log(1.05))
    steps and training resumes in the new regime."""
    renderer, params, batch = _tiny_setup()
    loss_config = LossConfig(lambda_regularization=0.0)
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(renderer, loss_config, optimizer, spike_guard=3.0)
    state = create_train_state(params, optimizer, spike_guard=True)
    key = jax.random.key(7)

    # 30 steps: loss drops ~20x; the lagging EMA settles (as in the ramp test)
    for _ in range(30):
        state, metrics = step(state, batch, key)
    assert float(metrics['update_skipped']) == 0.0
    latched_params = jax.tree.map(np.asarray, state.params)

    # every batch from here on lives in a ~4.7x-EMA loss regime (> the 3x bar)
    shifted = dict(batch, target_image=batch['target_image'] + 3.0)
    state, metrics = step(state, shifted, key)
    assert float(metrics['update_skipped']) == 1.0  # first sight: trips

    healthy_streak = 0
    for i in range(400):
        state, metrics = step(state, shifted, key)
        healthy_streak = 0 if float(metrics['update_skipped']) else healthy_streak + 1
        if healthy_streak >= 3:
            break
    assert healthy_streak >= 3, 'guard stayed latched across 400 steps'
    moved = any(not np.array_equal(a, np.asarray(b)) for a, b in zip(
        jax.tree.leaves(latched_params), jax.tree.leaves(state.params)))
    assert moved, 'params never updated in the new regime'


def test_ema_params_exact_lerp():
    """ema_decay: the ema_params leaf is the exact Polyak lerp of itself
    toward the post-update params each step, seeded from a copy of the init
    params (train/step.py _ema_update)."""
    renderer, params, batch = _tiny_setup()
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(renderer, LossConfig(lambda_regularization=0.0),
                           optimizer, ema_decay=0.9, donate=False)
    state = create_train_state(params, optimizer, ema=True)
    s1, _ = step(state, batch, jax.random.key(0))
    s2, _ = step(s1, batch, jax.random.key(0))

    def check(prev_ema, new_params, new_ema):
        expect = jax.tree.map(lambda e, p: 0.9 * e + 0.1 * p,
                              prev_ema, new_params)
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(new_ema)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    check(params, s1.params, s1.ema_params)
    check(s1.ema_params, s2.params, s2.ema_params)
    # the average lags the live params (it is not aliasing them)
    diff = any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(jax.tree.leaves(s2.params),
                               jax.tree.leaves(s2.ema_params)))
    assert diff, 'ema_params tracked the live params exactly'


def test_checkpoint_restores_across_ema_settings(tmp_path):
    """Checkpoints survive toggling EMA averaging between runs, in both
    directions (the ema_params leaf mirrors the guard-leaf tolerance)."""
    from sunerf_tpu.utils.checkpoint import (restore_train_checkpoint,
                                             save_train_checkpoint)

    renderer, params, batch = _tiny_setup()
    optimizer = make_optimizer()

    # ema-off checkpoint -> ema-on target: average restarts from the
    # RESTORED params, not the target's fresh init
    off = create_train_state(params, optimizer)
    step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
    off, _ = step(off, batch, jax.random.key(0))
    save_train_checkpoint(str(tmp_path / 'a'), off)
    on_target = create_train_state(params, optimizer, ema=True)
    restored = restore_train_checkpoint(str(tmp_path / 'a'), on_target)
    assert int(restored.step) == 1
    assert restored.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params['fine']['w_in']),
        np.asarray(off.params['fine']['w_in']))

    # ema-on checkpoint -> ema-off target: the leaf is dropped
    estep = make_train_step(renderer, LossConfig(), optimizer,
                            ema_decay=0.9, donate=False)
    on = create_train_state(params, optimizer, ema=True)
    on, _ = estep(on, batch, jax.random.key(0))
    save_train_checkpoint(str(tmp_path / 'b'), on)
    off_target = create_train_state(params, optimizer)
    restored = restore_train_checkpoint(str(tmp_path / 'b'), off_target)
    assert int(restored.step) == 1
    assert restored.ema_params is None
    np.testing.assert_array_equal(np.asarray(restored.params['fine']['w_in']),
                                  np.asarray(on.params['fine']['w_in']))

    # ema-on checkpoint -> ema-on target: the average itself round-trips
    on_target2 = create_train_state(params, optimizer, ema=True)
    restored = restore_train_checkpoint(str(tmp_path / 'b'), on_target2)
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params['fine']['w_in']),
        np.asarray(on.ema_params['fine']['w_in']))


def test_genx_reader_roundtrip():
    from sunerf_tpu.data.genx import read_genx
    d = read_genx('/root/reference/sunerf/data/aia_temp_resp.genx')
    assert set(d.keys()) == {'A94', 'A131', 'A171', 'A193', 'A211', 'A304',
                             'A335', 'HEADER'}
    a171 = d['A171']
    assert a171['NAME'] == 'A171'
    assert a171['UNITS'] == 'DN cm^5 s^-1 pix^-1'
    assert len(a171['LOGTE']) == 101 and len(a171['TRESP']) == 101
    assert float(np.max(a171['TRESP'])) > 1e-25  # 171 A is the strongest channel


def test_checkpoint_restores_across_guard_settings(tmp_path):
    """Checkpoints survive toggling the spike guard between runs (the guard
    added loss_ema/snapshot leaves to TrainState; restore must tolerate
    either direction rather than crash on tree-structure mismatch)."""
    from sunerf_tpu.utils.checkpoint import (restore_train_checkpoint,
                                             save_train_checkpoint)

    renderer, params, batch = _tiny_setup()
    optimizer = make_optimizer()

    # guard-off checkpoint -> guard-on target
    off = create_train_state(params, optimizer)
    step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
    off, _ = step(off, batch, jax.random.key(0))
    save_train_checkpoint(str(tmp_path / 'a'), off)
    on_target = create_train_state(params, optimizer, spike_guard=True)
    restored = restore_train_checkpoint(str(tmp_path / 'a'), on_target)
    assert int(restored.step) == 1
    assert restored.snapshot is not None
    np.testing.assert_array_equal(np.asarray(restored.params['fine']['w_in']),
                                  np.asarray(off.params['fine']['w_in']))
    # the guard snapshot must be rebuilt from the RESTORED params, not the
    # target's fresh-init params — otherwise a spike on the first post-resume
    # step would roll training back to untrained weights (ADVICE r2)
    np.testing.assert_array_equal(
        np.asarray(restored.snapshot[0]['fine']['w_in']),
        np.asarray(off.params['fine']['w_in']))
    assert float(restored.loss_ema) == -1.0  # EMA re-initializes post-resume

    # guard-on checkpoint -> guard-off target
    gstep = make_train_step(renderer, LossConfig(), optimizer,
                            spike_guard=10.0, donate=False)
    on = create_train_state(params, optimizer, spike_guard=True)
    on, _ = gstep(on, batch, jax.random.key(0))
    save_train_checkpoint(str(tmp_path / 'b'), on)
    off_target = create_train_state(params, optimizer)
    restored = restore_train_checkpoint(str(tmp_path / 'b'), off_target)
    assert int(restored.step) == 1
    assert restored.snapshot is None
    np.testing.assert_array_equal(np.asarray(restored.params['fine']['w_in']),
                                  np.asarray(on.params['fine']['w_in']))


def test_table_lr_mult_scales_only_grid_updates():
    """OptimConfig.table_lr_mult applies the NGP table-lr recipe to grid_*
    leaves only (train/optim.py _scale_table_updates)."""
    import jax
    import jax.numpy as jnp

    from sunerf_tpu.train.optim import OptimConfig, make_optimizer

    params = {'fine': {'w_in': jnp.ones((4, 4)), 'grid_0': jnp.ones((2, 2))}}
    grads = jax.tree.map(jnp.ones_like, params)

    base = make_optimizer(OptimConfig(adam_eps=1e-15))
    up_base, _ = base.update(grads, base.init(params), params)
    mult = make_optimizer(OptimConfig(table_lr_mult=10.0, adam_eps=1e-15))
    up_mult, _ = mult.update(grads, mult.init(params), params)

    import numpy as np
    np.testing.assert_allclose(up_mult['fine']['w_in'],
                               up_base['fine']['w_in'])
    np.testing.assert_allclose(up_mult['fine']['grid_0'],
                               10.0 * np.asarray(up_base['fine']['grid_0']),
                               rtol=1e-6)


def test_table_tv_regularizer():
    """LossConfig.lambda_table_tv: smoothness prior on grid tables only —
    zero for constant tables, positive for rough ones, and the train step
    adds it to the loss with a gradient that smooths the table."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig, table_tv
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    flat = {'fine': {'grid_0': jnp.zeros((4, 4, 4, 2))}}
    assert float(table_tv(flat)) == 0.0
    rough = {'fine': {'grid_0': jax.random.normal(jax.random.key(0),
                                                  (4, 4, 4, 2))}}
    assert float(table_tv(rough)) > 0.0
    assert float(table_tv({'fine': {'w_in': jnp.ones((4, 4))}})) == 0.0

    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32, n_freqs=2,
                                     grid_sizes=(8,), grid_features=4,
                                     grid_bound=1.3),
        n_stratified=4, n_hierarchical=8, use_fused=False)
    params = init(jax.random.key(0))
    # roughen the table so the TV gradient is visibly nonzero
    params['fine']['grid_0'] = jax.random.normal(
        jax.random.key(1), params['fine']['grid_0'].shape)
    optimizer = make_optimizer()
    batch_size = 16
    batch = {
        'rays': jnp.stack([jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]]),
                                    (batch_size, 1)),
                           jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]),
                                    (batch_size, 1))], axis=1),
        'time': jnp.zeros((batch_size, 1)),
        'target_image': jnp.full((batch_size, 1), 0.05),
    }
    step = make_train_step(renderer, LossConfig(lambda_table_tv=1.0),
                           optimizer, donate=False)
    state = create_train_state(params, optimizer)
    new_state, metrics = step(state, batch, jax.random.key(2))
    tv0 = float(metrics['table_tv'])
    assert tv0 > 0.0
    # loss includes the penalty
    base_step = make_train_step(renderer, LossConfig(), optimizer,
                                donate=False)
    _, base_metrics = base_step(create_train_state(params, optimizer),
                                batch, jax.random.key(2))
    assert float(metrics['loss']) > float(base_metrics['loss'])
    # one step under a dominant TV weight smooths the table
    strong = make_train_step(renderer, LossConfig(lambda_table_tv=1e4),
                             optimizer, donate=False)
    s = create_train_state(params, optimizer)
    for _ in range(3):
        s, m = strong(s, batch, jax.random.key(2))
    assert float(table_tv(s.params)) < tv0

    # composition with the fused kernel: the TV gradient (plain autodiff on
    # the params) must ADD to the custom-vjp d_table contribution
    renderer_f, init_f = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32, n_freqs=2,
                                     grid_sizes=(8,), grid_features=4,
                                     grid_bound=1.3),
        n_stratified=4, n_hierarchical=8, use_fused=True)
    step_f = make_train_step(renderer_f, LossConfig(lambda_table_tv=1.0),
                             optimizer, donate=False)
    params_f = init_f(jax.random.key(0))
    params_f['fine'] = dict(params_f['fine'],
                            grid_0=params['fine']['grid_0'])
    _, mf = step_f(create_train_state(params_f, optimizer), batch,
                   jax.random.key(2))
    assert float(mf['table_tv']) > 0.0 and np.isfinite(float(mf['loss']))


def test_drift_probe_render_and_psnr():
    """DriftProbe (train/probe.py): fixed high-latitude ray bundles render
    deterministically, probe_psnr caps identical stacks at 99 dB and drops
    when the field changes — the GT-free observability answer to the
    round-4 seed-8 scale-test reversal (RESULTS.md round-4 scale section)."""
    from sunerf_tpu.train.probe import DriftProbe, probe_psnr

    renderer, params, _ = _tiny_setup()
    probe = DriftProbe(renderer, distance=4.0, time=0.0, n_views=2,
                       resolution=8, lat_deg=60.0)
    a = probe.render(params)
    assert a.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(a))
    # deterministic: the same params render the same stack
    assert probe_psnr(probe.render(params), a) == 99.0
    # a perturbed field moves the probe
    bumped = jax.tree.map(lambda x: x + 0.05, params)
    moved = probe_psnr(probe.render(bumped), a)
    assert moved < 99.0
    # views actually sit at |lat| = 60 deg, one each side of the ecliptic
    lats = np.rad2deg(np.arcsin(
        probe.view_origins[:, 2] / np.linalg.norm(probe.view_origins,
                                                  axis=-1)))
    np.testing.assert_allclose(np.sort(lats), [-60.0, 60.0], atol=1e-4)
