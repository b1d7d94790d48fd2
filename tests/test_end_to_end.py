"""End-to-end closed loop (SURVEY §7 milestone): synthesize a multi-viewpoint
training set from the analytic SimpleStar through the DT renderer, train an
emission NeRF on it, verify the loss drops and the trained model re-renders
views — plus MHD field and evaluation-loader integration."""
import os
from datetime import datetime

import jax
import numpy as np
import pytest

from sunerf_tpu.evaluation.image_render import render_observers
from sunerf_tpu.evaluation.loader import SuNeRFLoader


def _render_config(tmp_path, n_views=8, resolution=16):
    observers = [{'name': 'aia', 'lat': 5.0 * ((i % 3) - 1), 'lon': i * 45.0,
                  'distance': 215.0,
                  'time': datetime(2012, 8, 20 + i).isoformat()}
                 for i in range(n_views)]
    return {
        'model': 'SimpleStar',
        'render_path': str(tmp_path / 'renders'),
        'render_format': ['fits', 'jpeg'],
        'resolution': resolution,
        'wavelengths': [193],
        'batch_size': 256,
        'pixel_intensity_factor': 1e9,  # images O(1) after the rho^2 integral
        'observers': observers,
    }


@pytest.fixture(scope='module')
def rendered_views(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp('closed_loop')
    config = _render_config(tmp_path)
    outputs = render_observers(config)
    return tmp_path, config, outputs


def test_render_produces_views(rendered_views):
    tmp_path, config, outputs = rendered_views
    assert len(outputs) == 8
    fits_files = sorted((tmp_path / 'renders' / 'aia' / '193').glob('*.fits'))
    assert len(fits_files) == 8
    from sunerf_tpu.data.fits import read_fits
    data, header = read_fits(str(fits_files[0]))
    assert data.shape == (16, 16)
    assert header['WAVELNTH'] == 193
    assert np.all(np.isfinite(data)) and data.max() > 0
    # the disk is brighter than the corners
    assert data[6:10, 6:10].mean() > data[:2, :2].mean()


def test_closed_loop_training_and_reload(rendered_views, tmp_path):
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    assert len(data.train) >= 10

    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)
    workdir = str(tmp_path / 'run')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(lambda_regularization=0.1,
                               scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=40, val_every=20,
                                     checkpoint_every=20, log_every=10,
                                     save_val_images=False),
        workdir=workdir)
    trainer.fit()

    # metrics were logged and loss decreased
    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    losses = [r['loss'] for r in recs if 'loss' in r]
    assert len(losses) >= 3
    assert losses[-1] < losses[0], f'loss did not drop: {losses}'
    val = [r for r in recs if 'val_psnr' in r]
    assert val, 'validation never ran'

    # resume path: a new Trainer picks up the checkpoint at step 40
    trainer2 = Trainer(
        renderer, init, data,
        loss_config=LossConfig(scaling_vmax=10.0),
        trainer_config=TrainerConfig(total_steps=40, save_val_images=False),
        workdir=workdir)
    assert int(trainer2.state.step) == 40

    # deployment bundle reloads and renders a novel view
    loader = SuNeRFLoader(os.path.join(workdir, 'save_state'), batch_size=256)
    assert loader.config['type'] == 'emission'
    view = loader.render_observer_image(lat=0.3, lon=1.0, time=0.0,
                                        distance=215.0, resolution=8)
    assert view.image.shape == (8, 8, 1)
    assert np.all(np.isfinite(view.image))
    assert view.height_map.shape == (8, 8)

    # direct field query (volume extraction path)
    raw = loader.load_coords(np.zeros((5, 4), np.float32))
    assert raw.shape == (5, 2)

    # eval-time budget override: deployment renders need not use the
    # train-time sample budget (scripts/eval_budget_sweep.py)
    loader_hi = SuNeRFLoader(os.path.join(workdir, 'save_state'),
                             batch_size=256,
                             render_overrides={'n_stratified': 16,
                                               'n_hierarchical': 24})
    assert loader_hi.renderer.n_stratified == 16
    assert loader_hi.renderer.n_hierarchical == 24
    assert loader.renderer.n_stratified == 8  # saved spec untouched
    view_hi = loader_hi.render_observer_image(lat=0.3, lon=1.0, time=0.0,
                                              distance=215.0, resolution=8)
    assert view_hi.image.shape == (8, 8, 1)
    assert np.all(np.isfinite(view_hi.image))


def test_keep_best_checkpoint(rendered_views, tmp_path):
    """keep_best writes a save_state_best bundle at the highest held-out val
    PSNR (last != best when long schedules degrade — RESULTS.md arch axis)."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)
    workdir = str(tmp_path / 'run')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=30, val_every=10,
                                     checkpoint_every=30, log_every=10,
                                     save_val_images=False, keep_best=True),
        workdir=workdir)
    trainer.fit()

    assert os.path.exists(os.path.join(workdir, 'save_state_best.npz'))
    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    vals = [r for r in recs if 'val_psnr' in r]
    bests = [r['val_best_psnr'] for r in recs if 'val_best_psnr' in r]
    # the best tracker is the running max of the val PSNRs
    assert bests and max(bests) == max(v['val_psnr'] for v in vals)
    assert bests == sorted(bests)

    # the best bundle loads and renders like any deployment bundle
    loader = SuNeRFLoader(os.path.join(workdir, 'save_state_best'),
                          batch_size=256)
    view = loader.render_observer_image(lat=0.1, lon=0.3, time=0.0,
                                        distance=215.0, resolution=8)
    assert np.all(np.isfinite(view.image))

    # the high-water mark survives a NEW Trainer on the same workdir
    # (preemption resume / two-phase annealing): a fresh instance must NOT
    # clobber save_state_best on a first validation worse than the record
    with open(os.path.join(workdir, 'save_state_best.json')) as f:
        assert float(json.load(f)['best_val_psnr']) == max(bests)
    trainer2 = Trainer(
        renderer, init, data,
        loss_config=LossConfig(scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=30, val_every=10,
                                     checkpoint_every=30, log_every=10,
                                     save_val_images=False, keep_best=True),
        workdir=workdir)
    assert trainer2._best_psnr_high_water() == max(bests)


def test_drift_probe_in_trainer(rendered_views, tmp_path):
    """TrainerConfig.drift_probe_views: every validation renders fixed
    high-latitude GT-free views and logs probe_stability_db /
    probe_drift_since_best_db — the observability answer to the round-4
    seed-8 long-schedule reversal (high-latitude drift invisible to the
    ecliptic-band validation; RESULTS.md round-4 scale section)."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)
    workdir = str(tmp_path / 'run')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=30, val_every=10,
                                     checkpoint_every=30, log_every=10,
                                     save_val_images=False, keep_best=True,
                                     drift_probe_views=2,
                                     drift_probe_resolution=8),
        workdir=workdir)
    assert trainer._drift_probe is not None
    # probe distance pinned from the held-out view's camera distance
    origins = np.asarray(data.valid.arrays['rays'][:, 0])
    d_val = float(np.median(np.linalg.norm(origins, axis=-1)))
    d_probe = float(np.linalg.norm(trainer._drift_probe.view_origins[0]))
    np.testing.assert_allclose(d_probe, d_val, rtol=1e-4)

    trainer.fit()

    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    stab = [r['probe_stability_db'] for r in recs
            if 'probe_stability_db' in r]
    drift = [r['probe_drift_since_best_db'] for r in recs
             if 'probe_drift_since_best_db' in r]
    # 4 validations (step-0 sanity + 3 periodic): stability from the 2nd
    # on; drift-since-best only after a high-water mark exists
    assert len(stab) >= 2 and all(np.isfinite(s) for s in stab)
    assert drift and all(np.isfinite(x) for x in drift)
    # early training moves the field fast — the probe must see change
    assert min(stab) < 99.0

    # warning path: band-val within 0.5 dB of its best WITHOUT beating it,
    # while the probe render sits far from the best-checkpoint reference →
    # probe_drift_warning fires and the evidence stacks are saved
    v_now = trainer.validate(998)['val_psnr']  # eval is deterministic
    trainer._probe_best_val = v_now + 0.2      # v in [best-0.5, best]
    trainer._probe_at_best = np.full_like(trainer._probe_prev, 1e3)
    val = trainer.validate(999)
    assert val.get('probe_drift_warning') == 1.0
    # and the gate: a validation that SETS a new best must not warn
    trainer._probe_best_val = v_now - 5.0
    trainer._probe_at_best = np.full_like(trainer._probe_prev, 1e3)
    val2 = trainer.validate(1000)
    assert 'probe_drift_warning' not in val2
    assert val['probe_drift_since_best_db'] < 25.0
    warn_files = [f for f in os.listdir(workdir)
                  if f.startswith('probe_warn_')]
    assert warn_files, 'warning evidence stack was not saved'
    saved = np.load(os.path.join(workdir, warn_files[0]))
    assert saved['probe'].shape == saved['at_best'].shape


def test_drift_probe_gate(rendered_views, tmp_path):
    """TrainerConfig.drift_probe_gate: probe-aware checkpoint selection —
    a keep_best promotion whose band-val gain is marginal
    (< drift_probe_gate_margin_db) while the high-latitude probe render
    has drifted past the warn threshold is VETOED; large band-val gains
    always promote (round-5 seed #1, ROADMAP)."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)

    # gate without a probe is a config error, not a silent no-op
    import pytest
    with pytest.raises(ValueError, match='drift_probe_gate'):
        Trainer(renderer, init, data,
                loss_config=LossConfig(scaling_vmax=10.0),
                trainer_config=TrainerConfig(drift_probe_gate=True),
                workdir=str(tmp_path / 'bad'))

    workdir = str(tmp_path / 'run')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=10, val_every=10,
                                     checkpoint_every=10, log_every=10,
                                     save_val_images=False, keep_best=True,
                                     drift_probe_views=2,
                                     drift_probe_resolution=8,
                                     drift_probe_gate=True),
        workdir=workdir)

    # first validation establishes the best bundle + the probe reference
    v_now = trainer.validate(1)['val_psnr']  # eval is deterministic

    # VETO: candidate improves the high-water by only +0.5 dB (< the 1.0 dB
    # margin) while the probe render sits far from the best-checkpoint
    # reference (drift << warn threshold)
    trainer._best_val_psnr = v_now - 0.5
    pinned = np.full_like(trainer._probe_prev, 1e3)
    trainer._probe_at_best = pinned
    trainer._probe_best_val = v_now - 0.5
    val = trainer.validate(2)
    assert val.get('probe_gate_rejected') == 1.0
    assert 'val_best_psnr' not in val            # promotion did not happen
    assert trainer._best_psnr_high_water() == v_now - 0.5
    # the probe reference stays pinned to the best ACCEPTED checkpoint
    assert np.all(trainer._probe_at_best == pinned)

    # BYPASS: a large band-val gain promotes despite the same probe drift
    trainer._best_val_psnr = v_now - 5.0
    trainer._probe_at_best = np.full_like(trainer._probe_prev, 1e3)
    trainer._probe_best_val = v_now - 5.0
    val2 = trainer.validate(3)
    assert 'probe_gate_rejected' not in val2
    assert val2.get('val_best_psnr') == v_now    # promoted
    # and the probe reference moved to the newly accepted checkpoint
    assert not np.all(trainer._probe_at_best == 1e3)


def test_ema_averaging_end_to_end(rendered_views, tmp_path):
    """TrainerConfig.ema_decay: validation scores the averaged variant
    (val_psnr_ema), save() writes a save_state_ema deployment bundle that
    loads and renders, keep_best records which variant won, and the ema
    leaf survives a resume (the continuous counterpart to keep_best for the
    long-schedule small-field degradation, RESULTS.md arch axis)."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)
    workdir = str(tmp_path / 'run')

    def make_trainer(total_steps):
        return Trainer(
            renderer, init, data,
            loss_config=LossConfig(scaling_vmax=10.0),
            optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
            trainer_config=TrainerConfig(total_steps=total_steps, val_every=10,
                                         checkpoint_every=20, log_every=10,
                                         save_val_images=False, keep_best=True,
                                         ema_decay=0.9),
            workdir=workdir)

    trainer = make_trainer(20)
    trainer.fit()

    # the averaged variant was scored at every validation
    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    emas = [r for r in recs if 'val_psnr_ema' in r]
    assert emas, 'no EMA validation scores logged'
    assert all(np.isfinite(r['val_psnr_ema']) and np.isfinite(r['val_ssim_ema'])
               for r in emas)

    # the smoothed deployment bundle exists, differs from the live bundle,
    # and renders like any other
    ema_bundle = os.path.join(workdir, 'save_state_ema')
    assert os.path.exists(ema_bundle + '.npz')
    live = np.load(os.path.join(workdir, 'save_state.npz'))
    ema = np.load(ema_bundle + '.npz')
    assert set(live.files) == set(ema.files)
    assert any(not np.array_equal(live[k], ema[k]) for k in live.files), \
        'EMA bundle is byte-identical to the live bundle'
    loader = SuNeRFLoader(ema_bundle, batch_size=256)
    view = loader.render_observer_image(lat=0.1, lon=0.3, time=0.0,
                                        distance=215.0, resolution=8)
    assert np.all(np.isfinite(view.image))

    # keep_best arbitration records which variant won the best bundle
    with open(os.path.join(workdir, 'save_state_best.json')) as f:
        best_cfg = json.load(f)
    assert best_cfg['best_variant'] in ('live', 'ema')

    # resume: the ema leaf survives the checkpoint round trip
    trainer2 = make_trainer(25)
    assert int(trainer2.state.step) == 20
    assert trainer2.state.ema_params is not None
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.ema_params['fine']['w_in']),
        np.asarray(trainer.state.ema_params['fine']['w_in']))
    trainer2.fit()
    assert int(trainer2.state.step) == 25


def test_budget_anneal_handoff(rendered_views, tmp_path):
    """Budget annealing (scripts/psi_protocol.py --anneal-frac): a warm phase
    at one sample budget hands off to a second Trainer at a cheaper budget
    through the checkpoint/resume path — params are budget-independent, so
    only the compiled program changes mid-run."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)
    workdir = str(tmp_path / 'run')
    mc = emission_config(n_layers=2, d_filter=32)

    def make_trainer(n_strat, n_hier, total_steps):
        renderer, init = make_emission_system(
            model_config=mc, n_stratified=n_strat, n_hierarchical=n_hier)
        return Trainer(
            renderer, init, data,
            loss_config=LossConfig(scaling_vmax=10.0),
            optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
            trainer_config=TrainerConfig(total_steps=total_steps,
                                         val_every=total_steps,
                                         checkpoint_every=total_steps,
                                         log_every=5, save_val_images=False),
            workdir=workdir)

    make_trainer(12, 12, 15).fit()           # warm phase at the fuller budget
    trainer2 = make_trainer(6, 6, 30)        # cheap phase resumes at step 15
    assert int(trainer2.state.step) == 15
    state = trainer2.fit()
    assert int(state.step) == 30

    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    losses = [(r['step'], r['loss']) for r in recs if 'loss' in r]
    assert any(s <= 15 for s, _ in losses) and any(s > 15 for s, _ in losses)
    assert all(np.isfinite(l) for _, l in losses)

    # the deployment bundle carries the LAST phase's (cheap) budget, and the
    # eval-budget override restores the full one (scripts/eval_budget_sweep.py)
    loader = SuNeRFLoader(os.path.join(workdir, 'save_state'), batch_size=256)
    assert loader.renderer.n_stratified == 6
    loader_hi = SuNeRFLoader(os.path.join(workdir, 'save_state'),
                             batch_size=256,
                             render_overrides={'n_stratified': 12,
                                               'n_hierarchical': 12})
    view = loader_hi.render_observer_image(lat=0.2, lon=0.5, time=0.0,
                                           distance=215.0, resolution=8)
    assert np.all(np.isfinite(view.image))


def test_closed_loop_with_occupancy(rendered_views, tmp_path):
    """Occupancy-guided training (core/occupancy.py): the Trainer's EMA grid
    updates run, training converges, and the checkpoint round-trips the grid."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)

    # threshold far above any activity: every update is decay-only, so the
    # grid's value after N updates is deterministic (0.9^N) — proves the
    # Trainer's EMA update path ran without depending on what the barely
    # trained field looks like (an untrained field is uniformly "active",
    # which correctly keeps all cells occupied)
    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8,
        occupancy={'enabled': True, 'nr': 16, 'ntheta': 4, 'nphi': 8,
                   'n_probe': 16, 'warmup': 10, 'update_every': 5,
                   'decay': 0.9, 'threshold': 1e9})
    workdir = str(tmp_path / 'run_occ')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(lambda_regularization=0.1, scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=30, val_every=30,
                                     checkpoint_every=30, log_every=10,
                                     save_val_images=False),
        workdir=workdir)
    trainer.fit()

    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(line) for line in f]
    losses = [r['loss'] for r in recs if 'loss' in r]
    assert losses[-1] < losses[0], f'loss did not drop: {losses}'
    # grid-health diagnostics ride along with the training metrics
    fracs = [r for r in recs if 'occ_r_frac' in r]
    assert fracs and 0.0 <= fracs[-1]['occ_r_frac'] <= 1.0
    assert 0.0 <= fracs[-1]['occ_ang_frac'] <= 1.0

    # the EMA updates ran at steps 10/15/20/25/30 (warmup inclusive):
    # decay-only -> 0.9^5 exactly
    occ_r = np.asarray(trainer.state.params['occupancy']['occ_r'])
    np.testing.assert_allclose(occ_r, 0.9 ** 5, rtol=1e-5)

    # resume restores the grid
    trainer2 = Trainer(renderer, init, data,
                       loss_config=LossConfig(scaling_vmax=10.0),
                       trainer_config=TrainerConfig(total_steps=30,
                                                    save_val_images=False),
                       workdir=workdir)
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params['occupancy']['occ_r']), occ_r)


def test_mhd_field_roundtrip(tmp_path):
    """Synthetic PSI cubes -> MHDFieldLoader -> interpolation matches the
    analytic profile the cubes were built from."""
    from sunerf_tpu.data.psi_io import rdhdf_3d, wrhdf_3d
    from sunerf_tpu.models.mhd_field import MHDFieldLoader, mhd_apply

    r = np.linspace(1.0, 3.0, 20)
    th = np.linspace(0.0, np.pi, 16)
    phi = np.linspace(0.0, 2 * np.pi, 24)
    # rho(r) = 100 / r^2, T(r) = 1.5 + 0.1*frame (cube axes [phi, th, r])
    for var, make in (('rho', lambda f: 100.0 / r[None, None, :] ** 2
                       + np.zeros((24, 16, 1))),
                      ('t', lambda f: np.full((24, 16, 20), 1.5 + 0.1 * f))):
        d = tmp_path / var
        d.mkdir()
        for f in range(2):
            wrhdf_3d(str(d / f'{var}00{2531 + f}.h5'), r, th, phi, make(f))

    # IO round-trip
    rr, tt, pp, data = rdhdf_3d(str(tmp_path / 'rho' / 'rho002531.h5'))
    np.testing.assert_allclose(rr, r)
    assert data.shape == (24, 16, 20)

    loader = MHDFieldLoader(str(tmp_path))
    assert loader.ffirst == 2531 and loader.flast == 2532
    params = loader.init_params()

    import jax.numpy as jnp
    pts = jnp.asarray([[2.0, 0.0, 0.0, 0.0],    # r=2, frame 0
                       [1.5, 0.0, 0.0, 1.0],    # r=1.5, frame 1
                       [10.0, 0.0, 0.0, 0.0]])  # outside the cube
    out = mhd_apply(loader.field, params, pts)
    raw = np.asarray(out.raw)
    np.testing.assert_allclose(raw[0, 0], np.log(100 / 4), rtol=1e-3)
    np.testing.assert_allclose(raw[1, 0], np.log(100 / 2.25), rtol=1e-3)
    # temperature channel: log10(1e6 * T)
    np.testing.assert_allclose(raw[0, 1], np.log10(1e6 * 1.5), rtol=1e-3)
    np.testing.assert_allclose(raw[1, 1], np.log10(1e6 * 1.6), rtol=1e-3)
    # outside: fill value
    np.testing.assert_allclose(raw[2, 0], np.log(1e-10), rtol=1e-3)


def test_mhd_renderer(tmp_path):
    from sunerf_tpu.data.psi_io import wrhdf_3d
    from sunerf_tpu.models.mhd_field import MHDFieldLoader
    from sunerf_tpu.systems import make_mhd_renderer

    r = np.linspace(1.0, 3.0, 10)
    th = np.linspace(0.0, np.pi, 8)
    phi = np.linspace(0.0, 2 * np.pi, 12)
    for var, val in (('rho', 1e4), ('t', 1.5)):
        d = tmp_path / var
        d.mkdir()
        for f in range(2):
            wrhdf_3d(str(d / f'{var}00{100 + f}.h5'), r, th, phi,
                     np.full((12, 8, 10), val))

    loader = MHDFieldLoader(str(tmp_path))
    renderer, params = make_mhd_renderer(loader, n_stratified=8,
                                         n_hierarchical=8, perturb=False)
    import jax.numpy as jnp
    params['coarse']['log_abs'] = jnp.zeros(7)
    from sunerf_tpu.core.geometry import observer_rays
    rays_o, rays_d = observer_rays(0.0, 0.0, 215.0, 4)
    out = renderer(params, jnp.asarray(rays_o.reshape(-1, 3)),
                   jnp.asarray(rays_d.reshape(-1, 3)),
                   jnp.zeros((16, 1)),
                   wavelengths=jnp.broadcast_to(jnp.array([193.0]), (16, 1)))
    assert np.all(np.isfinite(np.asarray(out['image'])))
    assert np.asarray(out['image']).max() > 0


def test_dt_closed_loop(tmp_path):
    """DT-head closed loop: SimpleStar multi-wavelength renders laid out as an
    <instrument>/<wavelength>/ tree -> multi-thermal loader -> DT training
    (loss drops) -> bundle reload."""
    config = {
        'model': 'SimpleStar',
        'render_path': str(tmp_path / 'mt'),
        'render_format': ['fits'],
        'resolution': 12,
        'wavelengths': [171, 193],
        'batch_size': 256,
        'pixel_intensity_factor': 1e9,
        'observers': [{'name': 'aia', 'lat': 2.0 * i - 6, 'lon': i * 51.0,
                       'distance': 215.0,
                       'time': datetime(2012, 11, 1 + i).isoformat()}
                      for i in range(7)],
    }
    render_observers(config)

    from sunerf_tpu.data.loaders import build_multi_thermal_data
    from sunerf_tpu.models.fields import density_temperature_config
    from sunerf_tpu.systems import make_density_temperature_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_multi_thermal_data(str(tmp_path / 'mt'),
                                    str(tmp_path / 'work'), batch_size=96)
    assert data.config['wavelengths'] == [171, 193]

    renderer, init = make_density_temperature_system(
        model_config=density_temperature_config(n_layers=2, d_filter=32),
        pixel_intensity_factor=1e9,
        n_stratified=8, n_hierarchical=8)
    workdir = str(tmp_path / 'run')
    trainer = Trainer(
        renderer, init, data,
        loss_config=LossConfig(image_scaling='none', lambda_regularization=0.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3),
        trainer_config=TrainerConfig(total_steps=30, val_every=30,
                                     checkpoint_every=30, log_every=10,
                                     save_val_images=False),
        workdir=workdir)
    trainer.fit()

    import json
    with open(os.path.join(workdir, 'metrics.jsonl')) as f:
        recs = [json.loads(l) for l in f]
    losses = [r['loss'] for r in recs if 'loss' in r]
    assert losses[-1] < losses[0], f'DT loss did not drop: {losses}'

    loader = SuNeRFLoader(os.path.join(workdir, 'save_state'), batch_size=256)
    view = loader.render_observer_image(lat=0.1, lon=0.5, time=0.0,
                                        distance=215.0, resolution=8,
                                        wavelengths=[171.0, 193.0])
    assert view.image.shape == (8, 8, 2)
    assert np.all(np.isfinite(view.image))


def test_video_flyby(rendered_views, tmp_path):
    """Flyby frames from a trained state (uses the closed-loop workdir)."""
    pytest.importorskip('PIL')
    from sunerf_tpu.evaluation.video import flyby_poses
    poses = flyby_poses(12, distance=200.0)
    assert len(poses) == 12
    lats = [p[0] for p in poses]
    dists = [p[2] for p in poses]
    assert min(dists) < 200.0  # zoom leg
    assert max(lats) > 0.5     # polar leg


def test_from_spec_all_heads(tmp_path):
    """Every serializable renderer spec reconstructs (checkpoint reload path)."""
    import jax
    from sunerf_tpu.systems import (from_spec, make_density_temperature_system,
                                    make_emission_system,
                                    make_simple_star_renderer,
                                    make_thomson_system)
    from sunerf_tpu.models.fields import emission_config

    for factory, kwargs in (
            (make_emission_system, dict(model_config=emission_config(n_layers=2, d_filter=16))),
            (make_density_temperature_system, dict()),
            (make_simple_star_renderer, dict()),
            (make_thomson_system, dict())):
        renderer, _ = factory(n_stratified=8, n_hierarchical=8, **kwargs)
        rebuilt, init = from_spec(renderer.spec)
        assert type(rebuilt.head) is type(renderer.head)
        assert rebuilt.n_stratified == 8

    # MHD spec round-trips through its data_path
    import numpy as np
    from sunerf_tpu.data.psi_io import wrhdf_3d
    from sunerf_tpu.models.mhd_field import MHDFieldLoader
    from sunerf_tpu.systems import make_mhd_renderer
    r = np.linspace(1.0, 2.0, 5)
    th = np.linspace(0.0, np.pi, 4)
    phi = np.linspace(0.0, 2 * np.pi, 6)
    for var in ('rho', 't'):
        d = tmp_path / var
        d.mkdir()
        for f in range(2):
            wrhdf_3d(str(d / f'{var}00{10 + f}.h5'), r, th, phi,
                     np.ones((6, 4, 5)))
    loader = MHDFieldLoader(str(tmp_path))
    renderer, params = make_mhd_renderer(loader, n_stratified=8,
                                         n_hierarchical=8)
    rebuilt, init = from_spec(renderer.spec)
    p = init()
    assert p['coarse']['log_abs'].shape == (7,)


def test_thomson_closed_loop():
    """Thomson head trains: fit a NeRF's electron density to white-light
    brightness rendered from a teacher field (the head the reference never
    wired to an entry point)."""
    import functools
    import jax.numpy as jnp
    from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply
    from sunerf_tpu.rendering.renderer import Renderer
    from sunerf_tpu.rendering.thomson import ThomsonHead
    from sunerf_tpu.models.fields import FieldOutput
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig, make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    # teacher: analytic electron density n_e = 1e8 * exp((1/r - 1)/h)
    def teacher_apply(params, pts):
        r = jnp.linalg.norm(pts[:, :3], axis=-1)
        log_ne = 8.0 + ((1.0 / jnp.maximum(r, 0.5) - 1.0) / 0.2) / jnp.log(10.0)
        return FieldOutput(raw=jnp.stack([log_ne, jnp.zeros_like(log_ne)], -1))

    head = ThomsonHead()
    teacher = Renderer(field_apply=teacher_apply, head=head,
                       n_stratified=8, n_hierarchical=8, perturb=False)

    n = 128
    key = jax.random.key(0)
    rays_o = jnp.tile(jnp.array([[4.0, 0.0, 0.0]]), (n, 1))
    dirs = jnp.array([[-1.0, 0.0, 0.0]]) + 0.15 * jax.random.normal(key, (n, 3))
    rays_d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    times = jnp.zeros((n, 1))
    target = teacher({'coarse': {}, 'fine': {}}, rays_o, rays_d, times)['image']
    assert np.all(np.isfinite(np.asarray(target))) and float(target.max()) > 0

    config = emission_config(n_layers=2, d_filter=32)
    student = Renderer(field_apply=functools.partial(nerf_apply, config),
                       head=head, n_stratified=8, n_hierarchical=8,
                       perturb=False)
    k1, k2 = jax.random.split(key)
    params = {'coarse': init_nerf(k1, config), 'fine': init_nerf(k2, config)}
    optimizer = make_optimizer(OptimConfig(lr_start=1e-3, lr_floor=1e-3))
    step = make_train_step(student, LossConfig(image_scaling='none',
                                               lambda_regularization=0.0),
                           optimizer)
    state = create_train_state(params, optimizer)
    batch = {'rays': jnp.stack([rays_o, rays_d], 1), 'time': times,
             'target_image': target}
    first = None
    for _ in range(25):
        state, metrics = step(state, batch, key)
        if first is None:
            first = float(metrics['loss'])
    assert float(metrics['loss']) < first, 'Thomson training did not improve'


def test_tier_warmup_swaps_programs(rendered_views, tmp_path):
    """TrainerConfig.tier_warmup_steps: the Trainer must run a full-budget
    (tier_fraction=0) program for the first N steps, then swap to the tiered
    program — the curriculum that prevents the DT head's zero-output collapse
    when the dim tier samples an untrained coarse CDF (DT_MATRIX_r4
    dt_tiered_half vs dt_tiered_warm)."""
    tmp_path_renders, config, _ = rendered_views

    from sunerf_tpu.data.loaders import build_single_channel_data
    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.loop import Trainer, TrainerConfig
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import OptimConfig

    data = build_single_channel_data(
        str(tmp_path_renders / 'renders' / 'aia' / '193' / '*.fits'),
        str(tmp_path / 'work'), batch_size=128)

    renderer, init = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8,
        tier_fraction=0.5, tier_samples=4)
    common = dict(
        loss_config=LossConfig(scaling_vmax=10.0),
        optim_config=OptimConfig(lr_start=1e-3, lr_floor=1e-3))

    trainer = Trainer(
        renderer, init, data, workdir=str(tmp_path / 'warm'),
        trainer_config=TrainerConfig(total_steps=8, tier_warmup_steps=4,
                                     val_every=8, checkpoint_every=8,
                                     log_every=8, save_val_images=False),
        **common)
    assert trainer.warmup_step_fn is not None

    calls = {'warm': 0, 'tiered': 0}

    def counted(fn, name):
        def inner(*a, **kw):
            calls[name] += 1
            return fn(*a, **kw)
        return inner

    trainer.warmup_step_fn = counted(trainer.warmup_step_fn, 'warm')
    trainer.step_fn = counted(trainer.step_fn, 'tiered')
    trainer.fit()
    assert calls == {'warm': 4, 'tiered': 4}

    # warmup=0 (round-3 behavior) and untiered renderers build no second
    # program — a tiny guard against paying a second trace for nothing
    t2 = Trainer(renderer, init, data, workdir=str(tmp_path / 'nowarm'),
                 trainer_config=TrainerConfig(total_steps=2,
                                              save_val_images=False),
                 **common)
    assert t2.warmup_step_fn is None
    untiered, init_u = make_emission_system(
        model_config=emission_config(n_layers=2, d_filter=32),
        n_stratified=8, n_hierarchical=8)
    t3 = Trainer(untiered, init_u, data, workdir=str(tmp_path / 'untiered'),
                 trainer_config=TrainerConfig(total_steps=2,
                                              tier_warmup_steps=4,
                                              save_val_images=False),
                 **common)
    assert t3.warmup_step_fn is None
