"""Training loop: jitted sharded steps over pre-batched ray shards, periodic
held-out-view validation (the de-facto integration test, SURVEY §4.2),
checkpoint/resume, metrics logging.

Replaces the reference's PyTorch-Lightning orchestration
(run_emission.py:65-75, model/sunerf.py:15-59, train/callback.py:17-88) with
a plain loop — steps dispatch asynchronously so the host stays ahead of the
device; validation and checkpointing are the only sync points.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np

from sunerf_tpu.core.scaling import image_asinh_scaling
from sunerf_tpu.data.datasets import iterate_batches
from sunerf_tpu.data.loaders import RayData
from sunerf_tpu.parallel.mesh import replicate, shard_batch
from sunerf_tpu.train.metrics import psnr as psnr_metric, ssim as ssim_metric
from sunerf_tpu.train.objective import LossConfig
from sunerf_tpu.train.optim import OptimConfig, make_optimizer
from sunerf_tpu.train.step import (create_train_state, make_eval_step,
                                   make_train_step)
from sunerf_tpu.utils.checkpoint import (restore_train_checkpoint,
                                         save_state, save_train_checkpoint)
from sunerf_tpu.utils.logging import MetricsLogger


def degenerate_prediction(pred: np.ndarray, target: np.ndarray,
                          rtol: float = 1e-6) -> bool:
    """True when a validation prediction is (near-)zero relative to its
    target — the signature of a collapsed multiplicative head (DT), whose
    PSNR/SSIM are then seed-independent scene constants."""
    return float(np.abs(pred).max()) < rtol * max(
        float(np.abs(target).max()), 1e-30)


@dataclasses.dataclass
class TrainerConfig:
    total_steps: int = 100_000
    val_every: int = 10_000
    checkpoint_every: int = 10_000
    log_every: int = 100
    seed: int = 7
    debug_nans: bool = False     # jax_debug_nans mode (SURVEY §5 race/NaN detection)
    save_val_images: bool = True
    # capture a jax.profiler trace over steps [profile_start, profile_start +
    # profile_steps) into <workdir>/profile (SURVEY §5: the reference has no
    # profiling at all); 0 disables
    profile_steps: int = 0
    profile_start: int = 10
    # keep a 'save_state_best' deployment bundle at the highest held-out
    # val PSNR seen so far (the reference keeps only save_last,
    # run_emission.py:53-55). Motivated by a measured failure mode: small
    # fields on long high-lr schedules overfit training rays while
    # re-rendered views DEGRADE (RESULTS.md architecture axis), so
    # last != best.
    keep_best: bool = False
    # Polyak/EMA parameter averaging (train/step.py ema_params leaf): the
    # CONTINUOUS counterpart to keep_best for the same measured failure mode
    # (long-schedule small-field degradation, RESULTS.md arch axis).
    # Validation additionally scores the averaged params (val_psnr_ema) and,
    # under keep_best, the better of live/EMA wins the save_state_best
    # bundle; save() writes a save_state_ema deployment variant.
    # 0.0 = off (reference parity). Typical: 0.999.
    ema_decay: float = 0.0
    # Tier warmup (curriculum for the adaptive per-ray budgets,
    # renderer.tier_fraction): the tiered fine pass places the dim tier's
    # samples from the coarse pass's CDF, which is uninformative at init.
    # On the DT head's multiplicative parametrization that starves half
    # the batch of gradient signal early and can collapse training into
    # the zero-output constant (DT_MATRIX_r4 dt_tiered_half: train
    # latched at the scene constant by step 1400 while the untier'd
    # proposal row trained fine on the same scene/seed). For the first
    # tier_warmup_steps the Trainer steps a full-budget clone of the
    # renderer (tier_fraction=0); the switch is a host-side swap between
    # two jitted programs, so shapes stay static inside each XLA program.
    # 0 = off (tiers from step 0, round-3 behavior).
    tier_warmup_steps: int = 0
    # GT-free high-latitude drift probe (train/probe.py): render
    # drift_probe_views FIXED |lat| = drift_probe_lat_deg viewpoints at
    # every validation and log probe_stability_db (vs the previous
    # validation) and probe_drift_since_best_db (vs the render at the
    # val-PSNR high-water mark). This is the observability answer to the
    # round-4 scale-test reversal: the deep-cut budgets can drift at high
    # latitude late in long schedules while the ecliptic-band validation
    # — the only ground truth solar data provides — stays flat, so
    # keep_best cannot see the failure (SCALE_PROOF_r4.jsonl seed 8,
    # RESULTS.md round-4 scale section). 0 = off.
    drift_probe_views: int = 0
    drift_probe_resolution: int = 64
    drift_probe_lat_deg: float = 60.0
    # warn when band-val sits within 0.5 dB of its high-water while the
    # probe render has moved by more than this (probe PSNR below this).
    # Default recalibrated in round 5: both recorded real failures'
    # drift traces bottom out at ~27-31 dB (the original 25 dB guess can
    # NEVER trip on them), and the gate-repair run at 34 dB vetoed the
    # drifting promotions and recovered +3.52 dB of a -4.10 dB failure
    # (SCALE_PROOF_r4.jsonl s7 512px probe_gate row; RESULTS.md round 5).
    drift_probe_warn_db: float = 34.0
    # PROBE-AWARE CHECKPOINT SELECTION (opt-in): when set, a keep_best
    # promotion is VETOED if the candidate's band-val improvement over
    # the reigning best is marginal (< drift_probe_gate_margin_db) while
    # its high-latitude probe render has moved more than the warn
    # threshold from the best-checkpoint reference — the long-schedule
    # signature (band-val creeps while |lat|>=25° degrades). Large
    # band-val improvements always promote: early training legitimately
    # moves everything. Validated round 5 on the reproduced 512px
    # over-training failure: gated keep_best 28.90 vs ungated 25.38
    # (parity 29.48) — a guardrail for schedules that over-run the
    # time-to-quality rule (MIGRATION.md), not a substitute for it.
    # Requires drift_probe_views > 0.
    drift_probe_gate: bool = False
    drift_probe_gate_margin_db: float = 1.0


class Trainer:
    def __init__(self, renderer, init_params, data: RayData,
                 loss_config: LossConfig = LossConfig(),
                 optim_config: OptimConfig = OptimConfig(),
                 trainer_config: TrainerConfig = TrainerConfig(),
                 workdir: str = './workdir', mesh=None,
                 logger: Optional[MetricsLogger] = None,
                 microbatch: Optional[int] = None,
                 spike_guard: Optional[float] = None):
        self.renderer = renderer
        self.data = data
        self.config = trainer_config
        self.workdir = workdir
        self.mesh = mesh
        os.makedirs(workdir, exist_ok=True)

        if trainer_config.debug_nans:
            jax.config.update('jax_debug_nans', True)

        self.optimizer = make_optimizer(optim_config)
        ema_decay = trainer_config.ema_decay or None
        self.step_fn = make_train_step(renderer, loss_config, self.optimizer,
                                       mesh=mesh, microbatch=microbatch,
                                       spike_guard=spike_guard,
                                       ema_decay=ema_decay)
        self.warmup_step_fn = None
        if trainer_config.tier_warmup_steps and \
                getattr(renderer, 'tier_fraction', 0.0):
            # full-budget program for steps [0, tier_warmup_steps) — same
            # TrainState layout, so the two programs alternate freely
            warm = dataclasses.replace(renderer, tier_fraction=0.0)
            self.warmup_step_fn = make_train_step(
                warm, loss_config, self.optimizer, mesh=mesh,
                microbatch=microbatch, spike_guard=spike_guard,
                ema_decay=ema_decay)
        self.eval_fn = make_eval_step(renderer, mesh=mesh)
        self._eval_many = self._make_eval_many()
        self.loss_config = loss_config

        params = init_params(jax.random.key(trainer_config.seed)) \
            if callable(init_params) else init_params
        occ_cfg = getattr(renderer, 'occupancy', None)
        if occ_cfg is not None and 'occupancy' not in params:
            # pre-built params from a factory that predates the occupancy
            # config: add the (fully-occupied) grid so the renderer actually
            # uses occupancy sampling and the EMA update has state to write
            from sunerf_tpu.core.occupancy import init_occupancy
            params = dict(params, occupancy=init_occupancy(occ_cfg))
        self.state = create_train_state(params, self.optimizer,
                                        spike_guard=spike_guard is not None,
                                        ema=ema_decay is not None)

        restored = restore_train_checkpoint(workdir, self.state)
        if restored is not None:
            self.state = restored
        if mesh is not None:
            self.state = replicate(mesh, self.state)

        self.logger = logger or MetricsLogger(workdir)
        self._occ_update_fn = self._make_occ_update()

        self._drift_probe = None
        self._probe_prev = None
        self._probe_at_best = None
        self._probe_best_val = -np.inf
        if trainer_config.drift_probe_gate and \
                not trainer_config.drift_probe_views:
            raise ValueError('drift_probe_gate requires drift_probe_views '
                             '> 0 (there is no probe to gate on)')
        if trainer_config.drift_probe_views:
            # observer distance / scene time / wavelength pinned from the
            # held-out view so the probe lives in the scene's own regime
            arrays = data.valid.arrays
            origins = np.asarray(arrays['rays'][:, 0])
            distance = float(np.median(np.linalg.norm(origins, axis=-1)))
            t_med = float(np.median(np.asarray(arrays['time'])))
            wl = arrays.get('wavelength')
            wl_val = float(np.asarray(wl).ravel()[0]) if wl is not None \
                else None
            from sunerf_tpu.train.probe import DriftProbe
            self._drift_probe = DriftProbe(
                renderer, distance, time=t_med,
                n_views=trainer_config.drift_probe_views,
                resolution=trainer_config.drift_probe_resolution,
                lat_deg=trainer_config.drift_probe_lat_deg,
                wavelength=wl_val)

    def _make_occ_update(self):
        """Jitted occupancy-grid EMA update (core/occupancy.py) from the fine
        field; None when the renderer doesn't use occupancy sampling."""
        occ_cfg = getattr(self.renderer, 'occupancy', None)
        if occ_cfg is None:
            return None
        from sunerf_tpu.core.occupancy import update_occupancy
        renderer = self.renderer

        def update(params, key, t):
            grid = update_occupancy(
                params['occupancy'], occ_cfg, renderer.field_apply,
                params['fine'], renderer.head.occupancy_activity, key, t,
                solar_radius=renderer.solar_radius)
            return grid
        if self.mesh is None:
            return jax.jit(update)
        from sunerf_tpu.parallel.mesh import replicated_sharding
        repl = replicated_sharding(self.mesh)
        return jax.jit(update, out_shardings=repl)

    def _make_eval_many(self):
        """The chunked held-out render, ray-sharded over the mesh when one is
        given (an 8-chip run validates on 8 chips, not 1)."""
        if self.mesh is None:
            return jax.jit(self._eval_chunked)
        from jax.sharding import PartitionSpec as P

        from sunerf_tpu.parallel.mesh import DATA_AXIS
        return jax.jit(jax.shard_map(
            self._eval_chunked, mesh=self.mesh,
            in_specs=(P(), P(None, DATA_AXIS)),
            out_specs=P(None, DATA_AXIS), check_vma=False))

    def _log_fit_start_overview(self):
        """Camera-pose quiver + sample-image strip at fit start (reference
        log_overview, train/callback.py:180-234, called from the data module
        at single_channel.py:32)."""
        overview = (self.data.extras or {}).get('overview')
        if not overview:
            return
        try:
            from sunerf_tpu.train.visualization import log_overview
            path = os.path.join(self.workdir, 'overview.jpg')
            log_overview(overview['images'], overview['poses'],
                         overview['times'], path,
                         wavelength=self.data.config.get('wavelength'))
            self.logger.log_image('overview', path, 0)
        except Exception as e:  # diagnostics never kill training
            self.logger.log({'overview_failed': 1.0}, 0)
            import logging
            logging.getLogger(__name__).warning('overview plot failed: %s', e)

    def _log_ray_sampling(self, key):
        """Stratified-vs-hierarchical sample-position diagnostic on a few
        held-out rays (reference plot_ray_sampling, callback.py:237-256)."""
        try:
            from sunerf_tpu.train.visualization import plot_ray_sampling
            arrays = self.data.valid.arrays
            n = min(32, next(iter(arrays.values())).shape[0])
            params = self.state.params
            rays = np.asarray(arrays['rays'][:n])
            times = np.asarray(arrays['time'][:n])
            wl = arrays.get('wavelength')
            render = self.renderer(
                jax.tree.map(np.asarray, params),
                rays[:, 0], rays[:, 1], times, key=key,
                wavelengths=None if wl is None else np.asarray(wl[:n]))
            path = os.path.join(self.workdir, 'ray_sampling.jpg')
            plot_ray_sampling(render['z_vals_stratified'],
                              render['z_vals_hierarchical'], path)
            self.logger.log_image('ray_sampling', path, 0)
        except Exception as e:
            import logging
            logging.getLogger(__name__).warning('ray-sampling plot failed: %s', e)

    # ------------------------------------------------------------------ fit
    def fit(self):
        cfg = self.config
        key = jax.random.key(cfg.seed)
        start_step = int(self.state.step)
        batches = iterate_batches(self.data.train, shuffle=True, seed=cfg.seed)

        if start_step == 0:
            self._log_fit_start_overview()
            self._log_ray_sampling(jax.random.key(cfg.seed + 1))
            # pre-training sanity render of the held-out view (reference
            # num_sanity_val_steps=-1, run_emission.py:70): a mis-wired run
            # shows a broken image immediately, not val_every steps later
            self.validate(0)

        # preemption handling: checkpoint on SIGTERM, then resume-from-last
        # recovers the run (SURVEY §5 — the reference has none)
        import signal
        preempted = {'flag': False}

        def _on_sigterm(signum, frame):
            preempted['flag'] = True
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread
            prev_handler = None

        from sunerf_tpu.utils.profiling import StepTimer, trace
        profile_cm = None
        timer = StepTimer()
        for step in range(start_step, cfg.total_steps):
            if cfg.profile_steps:
                if step == cfg.profile_start:
                    profile_cm = trace(os.path.join(self.workdir, 'profile'))
                    profile_cm.__enter__()
                elif profile_cm is not None and \
                        step == cfg.profile_start + cfg.profile_steps:
                    profile_cm.__exit__(None, None, None)
                    profile_cm = None
            if preempted['flag']:
                self.save(step)
                self.logger.log({'preempted': 1.0}, step)
                if prev_handler is not None:
                    signal.signal(signal.SIGTERM, prev_handler)
                return self.state
            batch = next(batches)
            batch = {k: np.ascontiguousarray(v) for k, v in batch.items()}
            t0 = float(batch['time'].ravel()[0])  # host-side, no device sync
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            fn = (self.warmup_step_fn
                  if self.warmup_step_fn is not None
                  and step < cfg.tier_warmup_steps else self.step_fn)
            self.state, metrics = fn(self.state, batch, key)
            timer.tick(batch['rays'].shape[0])

            if self._occ_update_fn is not None:
                occ = self.renderer.occupancy
                if (step + 1) >= occ.warmup and (step + 1) % occ.update_every == 0:
                    grid = self._occ_update_fn(
                        self.state.params,
                        jax.random.fold_in(jax.random.key(cfg.seed + 2), step),
                        t0)
                    self.state = self.state._replace(
                        params=dict(self.state.params, occupancy=grid))

            if (step + 1) % cfg.log_every == 0:
                # rate() fetches the loss scalar first, forcing completion of
                # the async chain (the axon tunnel returns from
                # block_until_ready before remote execution finishes)
                rate = timer.rate(sync_value=metrics['loss'])
                m = {k: float(v) for k, v in metrics.items()}
                m['rays_per_sec'] = rate
                if self._occ_update_fn is not None:
                    # grid health: collapse diagnosis needs the occupied
                    # fractions alongside the loss trajectory
                    g = self.state.params['occupancy']
                    m['occ_r_frac'] = float(
                        (np.asarray(g['occ_r']) > 0.5).mean())
                    m['occ_ang_frac'] = float(
                        (np.asarray(g['occ_ang']) > 0.5).mean())
                    if 'occ_vol' in g:
                        m['occ_vol_frac'] = float(
                            (np.asarray(g['occ_vol']) > 0.5).mean())
                if not np.isfinite(m['loss']):
                    raise FloatingPointError(
                        f'! [Numerical Alert] non-finite loss at step {step + 1}')
                self.logger.log(m, step + 1)
                timer.reset()

            if (step + 1) % cfg.val_every == 0:
                self.validate(step + 1)

            if (step + 1) % cfg.checkpoint_every == 0 or step + 1 == cfg.total_steps:
                self.save(step + 1)
        return self.state

    # ------------------------------------------------------------- validate
    def _eval_chunked(self, params, batch):
        """One jitted lax.map over [C, bs, ...] chunks — the whole held-out
        view renders in a single dispatch + single host fetch (per-batch
        loops cost a tunnel round trip each; see evaluation/loader.py)."""
        def body(chunk):
            out = self.renderer(params, chunk['rays'][:, 0], chunk['rays'][:, 1],
                                chunk['time'], key=None,
                                wavelengths=chunk.get('wavelength'))
            return (out['fine_image'], out['coarse_image'],
                    out['height_map'], out['absorption_map'])
        return jax.lax.map(body, batch)

    def validate(self, step: int) -> dict:
        """Re-render the held-out view and score it (reference
        TestImageCallback, train/callback.py:30-58)."""
        import jax.numpy as jnp
        params = jax.tree.map(np.asarray, self.state.params)
        arrays = self.data.valid.arrays
        n = next(iter(arrays.values())).shape[0]
        bs = self.data.valid.batch_size
        n_pad = (n + bs - 1) // bs * bs
        chunked = {
            k: jnp.asarray(np.pad(v, ((0, n_pad - n),) + ((0, 0),) * (v.ndim - 1))
                           .reshape(n_pad // bs, bs, *v.shape[1:]))
            for k, v in arrays.items()}
        target_chunks = chunked.pop('target_image')
        fine, coarse, height, absorption = self._eval_many(params, chunked)

        def flat(x):
            return np.asarray(x).reshape(n_pad, -1)[:n]
        pred = flat(fine)
        coarse = flat(coarse)
        target = np.asarray(target_chunks).reshape(n_pad, -1)[:n]
        height = flat(height)[:, 0]
        absorption = flat(absorption)[:, 0]

        if self.loss_config.image_scaling == 'asinh':
            pred_s = np.asarray(image_asinh_scaling(
                pred, self.loss_config.scaling_vmax, self.loss_config.scaling_a))
            target_s = np.asarray(image_asinh_scaling(
                target, self.loss_config.scaling_vmax, self.loss_config.scaling_a))
            coarse_s = np.asarray(image_asinh_scaling(
                coarse, self.loss_config.scaling_vmax, self.loss_config.scaling_a))
        else:
            pred_s, target_s, coarse_s = pred, target, coarse

        h, w = self.data.validation_shape
        n_ch = pred.shape[-1]
        val = {'val_loss': float(np.mean((pred_s - target_s) ** 2))}
        # Degenerate-output sentinel: a (near-)zero prediction scores a
        # seed-independent scene constant that is easy to misread as a real
        # metric (the DT head's multiplicative parametrization collapses this
        # way when the pixel_intensity_factor leaves init predictions orders
        # of magnitude below the targets — see RESULTS.md round-3 DT
        # ablation; two TPU reruns were burned before the constant was
        # recognized). Flag it loudly at the source instead.
        val['val_pred_absmax'] = float(np.abs(pred).max())
        if degenerate_prediction(pred, target):
            print(f'WARNING: validation prediction is (near-)zero '
                  f'(|pred|_max={val["val_pred_absmax"]:.3e} vs '
                  f'|target|_max={float(np.abs(target).max()):.3e}) — the '
                  f'val PSNR/SSIM below are the zero-output scene constant, '
                  f'not evidence of training. For DT heads check '
                  f'pixel_intensity_factor (reference default 1e17).',
                  flush=True)
            val['val_pred_degenerate'] = True
        psnrs, ssims = [], []
        for c in range(n_ch):
            p_img = pred_s[:, c].reshape(h, w)
            t_img = target_s[:, c].reshape(h, w)
            if np.all(t_img == 0):
                continue  # padded absent channel
            psnrs.append(psnr_metric(p_img, t_img))
            ssims.append(ssim_metric(p_img, t_img,
                                     data_range=float(t_img.max() - t_img.min() or 1)))
            if self.config.save_val_images:
                wl_arr = arrays.get('wavelength')
                wl_c = (float(np.asarray(wl_arr)[0, c])
                        if wl_arr is not None and np.asarray(wl_arr).ndim == 2
                        and c < np.asarray(wl_arr).shape[1]
                        else self.data.config.get('wavelength'))
                self._save_val_image(p_img, t_img, step, c,
                                     coarse_s[:, c].reshape(h, w),
                                     height.reshape(h, w),
                                     absorption.reshape(h, w),
                                     wavelength=wl_c)
        # GT-free high-latitude probe render — computed BEFORE the keep_best
        # decision so drift_probe_gate can veto a marginal promotion whose
        # probe render has drifted (stability/drift metrics logged below)
        probe = None
        probe_drift = None
        if self._drift_probe is not None:
            from sunerf_tpu.train.probe import probe_psnr
            probe = self._drift_probe.render(params)
            if self.loss_config.image_scaling == 'asinh':
                probe = np.asarray(image_asinh_scaling(
                    probe, self.loss_config.scaling_vmax,
                    self.loss_config.scaling_a))
            if self._probe_prev is not None:
                val['probe_stability_db'] = probe_psnr(probe,
                                                       self._probe_prev)
            if self._probe_at_best is not None:
                probe_drift = probe_psnr(probe, self._probe_at_best)
                val['probe_drift_since_best_db'] = probe_drift

        if psnrs:
            val['val_psnr'] = float(np.mean(psnrs))
            val['val_ssim'] = float(np.mean(ssims))
            # the candidate set for keep_best: live params, plus the
            # EMA-averaged variant when enabled (TrainerConfig.ema_decay)
            candidates = [('live', val['val_psnr'], params)]
            if getattr(self.state, 'ema_params', None) is not None:
                ema_host = jax.tree.map(np.asarray, self._ema_render_params())
                fine_e, _, _, _ = self._eval_many(ema_host, chunked)
                pred_e = np.asarray(fine_e).reshape(n_pad, -1)[:n]
                if self.loss_config.image_scaling == 'asinh':
                    pred_es = np.asarray(image_asinh_scaling(
                        pred_e, self.loss_config.scaling_vmax,
                        self.loss_config.scaling_a))
                else:
                    pred_es = pred_e
                psnrs_e, ssims_e = [], []
                for c in range(n_ch):
                    t_img = target_s[:, c].reshape(h, w)
                    if np.all(t_img == 0):
                        continue
                    p_img = pred_es[:, c].reshape(h, w)
                    psnrs_e.append(psnr_metric(p_img, t_img))
                    ssims_e.append(ssim_metric(
                        p_img, t_img,
                        data_range=float(t_img.max() - t_img.min() or 1)))
                if psnrs_e:
                    val['val_psnr_ema'] = float(np.mean(psnrs_e))
                    val['val_ssim_ema'] = float(np.mean(ssims_e))
                    candidates.append(('ema', val['val_psnr_ema'], ema_host))
            best_name, best_score, best_params = max(candidates,
                                                     key=lambda c: c[1])
            promote = (self.config.keep_best
                       and best_score > self._best_psnr_high_water())
            if (promote and self.config.drift_probe_gate
                    and probe_drift is not None
                    and probe_drift < self.config.drift_probe_warn_db
                    and best_score - self._best_psnr_high_water()
                        < self.config.drift_probe_gate_margin_db):
                # probe-aware selection: the candidate's band-val gain is
                # marginal while its |lat|=60° render has moved far from
                # the reigning best checkpoint's — the long-schedule drift
                # signature. Keep the old best; keep the probe reference
                # pinned to it (see the reference update below).
                promote = False
                val['probe_gate_rejected'] = 1.0
                print(f'drift_probe_gate at step {step}: keep_best '
                      f'promotion VETOED — band-val {best_score:.2f} is '
                      f'only +{best_score - self._best_psnr_high_water():.2f} '
                      f'dB over the best bundle while the high-latitude '
                      f'probe moved {probe_drift:.1f} dB from its render '
                      f'(< {self.config.drift_probe_warn_db:.0f} dB '
                      f'threshold). Retaining the previous best.',
                      flush=True)
            if promote:
                self._best_val_psnr = best_score
                config = dict(self.data.config)
                if self.renderer.spec is not None:
                    config['renderer_spec'] = self.renderer.spec
                # stamp the score into the bundle so a NEW Trainer on the
                # same workdir (preemption resume, two-phase annealing)
                # restores the high-water mark instead of clobbering the
                # best bundle with its first validation
                config['best_val_psnr'] = best_score
                config['best_variant'] = best_name
                save_state(os.path.join(self.workdir, 'save_state_best'),
                           jax.tree.map(np.asarray, best_params), config)
                val['val_best_psnr'] = best_score

        if probe is not None:
            if probe_drift is not None:
                drift = probe_drift
                # the failure signature is band-val sitting NEAR its best
                # WITHOUT beating it while the probe drifts; a validation
                # that sets a new high-water replaces the reference render
                # anyway, and early training legitimately moves everything
                # (the DT smoke fired a false positive here before this
                # gate: any improvement on a terrible first val counted
                # as "near best")
                v = val.get('val_psnr', -np.inf)
                near_best = (v >= self._probe_best_val - 0.5
                             and v <= self._probe_best_val)
                if near_best and drift < self.config.drift_probe_warn_db:
                    print(f'WARNING: high-latitude drift probe at step '
                          f'{step}: band-val is within 0.5 dB of its best '
                          f'({val.get("val_psnr", float("nan")):.2f} vs '
                          f'{self._probe_best_val:.2f}) but the |lat|='
                          f'{self.config.drift_probe_lat_deg:.0f}° probe '
                          f'render has moved {drift:.1f} dB from the '
                          f'best-checkpoint render (< '
                          f'{self.config.drift_probe_warn_db:.0f} dB '
                          f'threshold) — the seed-8 long-schedule failure '
                          f'signature (RESULTS.md round-4 scale section). '
                          f'High-latitude renders from this run may be '
                          f'unreliable; prefer a milder sample budget '
                          f'(24+48) or inspect the probe images.',
                          flush=True)
                    val['probe_drift_warning'] = 1.0
                    # the evidence for the warning: current stack + the
                    # best-checkpoint reference it drifted from
                    np.savez(os.path.join(self.workdir,
                                          f'probe_warn_{step:08d}.npz'),
                             probe=probe, at_best=self._probe_at_best)
            # the probe reference tracks the best ACCEPTED checkpoint: a
            # gate-rejected candidate must not move it, or the drift
            # reference would creep along with the drifting field
            if val.get('val_psnr', -np.inf) > self._probe_best_val and \
                    not val.get('probe_gate_rejected'):
                self._probe_best_val = val['val_psnr']
                self._probe_at_best = probe
            self._probe_prev = probe

        self.logger.log(val, step)
        return val

    def _ema_render_params(self) -> dict:
        """The EMA params with NON-learned leaves (the occupancy grid) taken
        from the LIVE params: averaging the grid would lag the sampling
        distribution rather than smooth the field."""
        ema = dict(self.state.ema_params)
        if 'occupancy' in ema and 'occupancy' in self.state.params:
            ema['occupancy'] = self.state.params['occupancy']
        return ema

    def _best_psnr_high_water(self) -> float:
        """Best held-out PSNR seen by ANY Trainer on this workdir: in-memory
        if this instance already validated, else recovered from the existing
        save_state_best bundle (preemption resume / multi-phase schedules
        must not overwrite a better checkpoint with a worse first val)."""
        if hasattr(self, '_best_val_psnr'):
            return self._best_val_psnr
        sidecar = os.path.join(self.workdir, 'save_state_best.json')
        if os.path.exists(sidecar):
            try:
                with open(sidecar) as fh:
                    return float(json.load(fh).get('best_val_psnr', -np.inf))
            except (ValueError, OSError):
                return -np.inf
        return -np.inf

    def _save_val_image(self, pred, target, step, channel, coarse=None,
                        height=None, absorption=None, wavelength=None):
        """6-panel validation figure (reference TestImageCallback,
        train/callback.py:38-58): target / fine / coarse / |error| /
        emission-height map / absorption map. Image panels use the
        per-wavelength instrument colormap when the channel is known
        (reference callback.py:141; utils/colormaps.py native tables)."""
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
        except Exception:
            return
        from sunerf_tpu.utils.colormaps import wavelength_cmap
        img_cmap = wavelength_cmap(wavelength)
        panels = [('target', target, img_cmap), ('fine', pred, img_cmap)]
        if coarse is not None:
            panels.append(('coarse', coarse, img_cmap))
        panels.append(('|error|', np.abs(pred - target), 'viridis'))
        if height is not None:
            panels.append(('height map', height, 'plasma'))
        if absorption is not None:
            panels.append(('absorption map', absorption, 'cividis'))
        n = len(panels)
        fig, axs = plt.subplots(1, n, figsize=(3 * n, 3.2))
        vmax = max(float(np.nanmax(target)), 1e-10)
        for ax, (title, img, cmap) in zip(np.atleast_1d(axs), panels):
            kw = dict(vmin=0, vmax=vmax) if cmap == img_cmap else {}
            ax.imshow(img, cmap=cmap, origin='lower', **kw)
            ax.set_title(title, fontsize=9)
            ax.axis('off')
        path = os.path.join(self.workdir,
                            f'val_{step:08d}_ch{channel}.jpg')
        fig.savefig(path, dpi=100, bbox_inches='tight')
        plt.close(fig)
        self.logger.log_image(f'val_image_ch{channel}', path, step)

    # ----------------------------------------------------------------- save
    def save(self, step: int):
        host_state = jax.tree.map(np.asarray, self.state)
        save_train_checkpoint(self.workdir, host_state)
        # deployment bundle for the evaluation stack (reference .snf role)
        config = dict(self.data.config)
        if self.renderer.spec is not None:
            config['renderer_spec'] = self.renderer.spec
        save_state(os.path.join(self.workdir, 'save_state'),
                   jax.tree.map(np.asarray, self.state.params), config)
        if getattr(self.state, 'ema_params', None) is not None:
            # smoothed deployment variant (TrainerConfig.ema_decay)
            save_state(os.path.join(self.workdir, 'save_state_ema'),
                       jax.tree.map(np.asarray, self._ema_render_params()),
                       config)
