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
import os
import time
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


class Trainer:
    def __init__(self, renderer, init_params, data: RayData,
                 loss_config: LossConfig = LossConfig(),
                 optim_config: OptimConfig = OptimConfig(),
                 trainer_config: TrainerConfig = TrainerConfig(),
                 workdir: str = './workdir', mesh=None,
                 logger: Optional[MetricsLogger] = None):
        self.renderer = renderer
        self.data = data
        self.config = trainer_config
        self.workdir = workdir
        self.mesh = mesh
        os.makedirs(workdir, exist_ok=True)

        if trainer_config.debug_nans:
            jax.config.update('jax_debug_nans', True)

        self.optimizer = make_optimizer(optim_config)
        self.step_fn = make_train_step(renderer, loss_config, self.optimizer,
                                       mesh=mesh)
        self.eval_fn = make_eval_step(renderer)  # single-device eval (small val sets)
        self.loss_config = loss_config

        params = init_params(jax.random.key(trainer_config.seed)) \
            if callable(init_params) else init_params
        self.state = create_train_state(params, self.optimizer)

        restored = restore_train_checkpoint(workdir, self.state)
        if restored is not None:
            self.state = restored
        if mesh is not None:
            self.state = replicate(mesh, self.state)

        self.logger = logger or MetricsLogger(workdir)

    # ------------------------------------------------------------------ fit
    def fit(self):
        cfg = self.config
        key = jax.random.key(cfg.seed)
        start_step = int(self.state.step)
        batches = iterate_batches(self.data.train, shuffle=True, seed=cfg.seed)

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

        profiling = False
        t0 = time.perf_counter()
        rays_done = 0
        for step in range(start_step, cfg.total_steps):
            if cfg.profile_steps:
                if step == cfg.profile_start:
                    jax.profiler.start_trace(os.path.join(self.workdir, 'profile'))
                    profiling = True
                elif profiling and step == cfg.profile_start + cfg.profile_steps:
                    jax.profiler.stop_trace()
                    profiling = False
            if preempted['flag']:
                self.save(step)
                self.logger.log({'preempted': 1.0}, step)
                if prev_handler is not None:
                    signal.signal(signal.SIGTERM, prev_handler)
                return self.state
            batch = next(batches)
            batch = {k: np.ascontiguousarray(v) for k, v in batch.items()}
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            self.state, metrics = self.step_fn(self.state, batch, key)
            rays_done += batch['rays'].shape[0]

            if (step + 1) % cfg.log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                m['rays_per_sec'] = rays_done / dt
                if not np.isfinite(m['loss']):
                    raise FloatingPointError(
                        f'! [Numerical Alert] non-finite loss at step {step + 1}')
                self.logger.log(m, step + 1)
                t0, rays_done = time.perf_counter(), 0

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
        if not hasattr(self, '_eval_many'):
            self._eval_many = jax.jit(self._eval_chunked)
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
                self._save_val_image(p_img, t_img, step, c,
                                     coarse_s[:, c].reshape(h, w),
                                     height.reshape(h, w),
                                     absorption.reshape(h, w))
        if psnrs:
            val['val_psnr'] = float(np.mean(psnrs))
            val['val_ssim'] = float(np.mean(ssims))
        self.logger.log(val, step)
        return val

    def _save_val_image(self, pred, target, step, channel, coarse=None,
                        height=None, absorption=None):
        """6-panel validation figure (reference TestImageCallback,
        train/callback.py:38-58): target / fine / coarse / |error| /
        emission-height map / absorption map."""
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
        except Exception:
            return
        panels = [('target', target, 'afmhot'), ('fine', pred, 'afmhot')]
        if coarse is not None:
            panels.append(('coarse', coarse, 'afmhot'))
        panels.append(('|error|', np.abs(pred - target), 'viridis'))
        if height is not None:
            panels.append(('height map', height, 'plasma'))
        if absorption is not None:
            panels.append(('absorption map', absorption, 'cividis'))
        n = len(panels)
        fig, axs = plt.subplots(1, n, figsize=(3 * n, 3.2))
        vmax = max(float(np.nanmax(target)), 1e-10)
        for ax, (title, img, cmap) in zip(np.atleast_1d(axs), panels):
            kw = dict(vmin=0, vmax=vmax) if cmap == 'afmhot' else {}
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
