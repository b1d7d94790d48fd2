"""Density-temperature SuNeRF training CLI.

Usage: python -m sunerf_tpu.run_density_temperature --config config/dt.yaml
(reference: sunerf/run_density_temperature.py:21-91 — seeds fixed, raw
intensities in the loss, MultiThermal data pipeline, NeRF_DT model).
"""
from __future__ import annotations

import argparse
from datetime import datetime

import jax
import yaml

from sunerf_tpu.data.loaders import build_multi_thermal_data
from sunerf_tpu.models.fields import density_temperature_config
from sunerf_tpu.parallel.mesh import make_mesh
from sunerf_tpu.systems import make_density_temperature_system
from sunerf_tpu.train.loop import Trainer, TrainerConfig
from sunerf_tpu.train.objective import LossConfig
from sunerf_tpu.train.optim import OptimConfig
from sunerf_tpu.utils.logging import MetricsLogger


def main(argv=None):
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True)
    args = parser.parse_args(argv)
    with open(args.config) as f:
        config = yaml.safe_load(f)

    data_cfg = config.get('data', {})
    train_cfg = config.get('training', {})
    log_cfg = config.get('logging', {})
    model_cfg = config.get('model', {})

    workdir = config.get('path_to_save', config.get('workdir', './workdir'))
    working_dir = config.get('work_directory', workdir + '/batches')

    mesh = make_mesh() if jax.device_count() > 1 else None
    n_devices = mesh.size if mesh is not None else 1

    ref_time = data_cfg.get('ref_time')
    data = build_multi_thermal_data(
        data_path=data_cfg['data_path'],
        working_dir=working_dir,
        Rs_per_ds=data_cfg.get('Rs_per_ds', 1.0),
        seconds_per_dt=data_cfg.get('seconds_per_dt', 86400.0),
        ref_time=datetime.fromisoformat(ref_time) if ref_time else None,
        batch_size=data_cfg.get('batch_size', 1024),
        n_devices=n_devices,
        target_resolution=data_cfg.get('target_resolution',
                                       data_cfg.get('downscaling_factor')
                                       and None),
        debug=data_cfg.get('debug', False))

    # model: {coarse: {n_layers: 4, d_filter: 128}} opts into a small
    # proposal-style coarse field (systems.make_density_temperature_system)
    model_cfg = dict(model_cfg)
    coarse_cfg = model_cfg.pop('coarse', None)
    nerf_cfg = density_temperature_config(**model_cfg)
    renderer, init = make_density_temperature_system(
        Rs_per_ds=data.Rs_per_ds, model_config=nerf_cfg,
        coarse_config=(density_temperature_config(**coarse_cfg)
                       if coarse_cfg else None),
        pixel_intensity_factor=float(config.get('pixel_intensity_factor', 1e17)),
        **config.get('rendering', {}))

    loss_config = LossConfig(
        lambda_image=config.get('lambda_image', 1.0),
        lambda_regularization=config.get('lambda_regularization', 1.0),
        image_scaling='none',
        lambda_table_tv=config.get('lambda_table_tv', 0.0))

    trainer_config = TrainerConfig(
        total_steps=train_cfg.get('total_steps',
                                  train_cfg.get('epochs', 100)
                                  * max(len(data.train), 1)),
        val_every=train_cfg.get('log_every_n_steps', 10_000),
        checkpoint_every=train_cfg.get('checkpoint_every',
                                       train_cfg.get('log_every_n_steps', 10_000)),
        log_every=train_cfg.get('scalar_log_every', 100),
        debug_nans=train_cfg.get('debug_nans', False),
        keep_best=train_cfg.get('keep_best', False),
        ema_decay=train_cfg.get('ema_decay', 0.0),
        # GT-free high-latitude drift probe (train/probe.py, RESULTS.md
        # round-4 scale section); drift_probe_views: 0 disables
        drift_probe_views=train_cfg.get('drift_probe_views', 4),
        drift_probe_resolution=train_cfg.get('drift_probe_resolution', 64),
        drift_probe_lat_deg=train_cfg.get('drift_probe_lat_deg', 60.0),
        # opt-in probe-aware checkpoint selection (round-5 seed):
        # veto marginal keep_best promotions whose probe render
        # drifted past drift_probe_warn_db (loop.py drift_probe_gate)
        drift_probe_gate=train_cfg.get('drift_probe_gate', False),
        drift_probe_gate_margin_db=train_cfg.get(
            'drift_probe_gate_margin_db', 1.0))

    logger = MetricsLogger(workdir, project=log_cfg.get('project'),
                           name=log_cfg.get('name'),
                           use_wandb=log_cfg.get('wandb', None))

    trainer = Trainer(renderer, init, data, loss_config=loss_config,
                      optim_config=OptimConfig(**config.get('optimizer', {})),
                      trainer_config=trainer_config, workdir=workdir,
                      mesh=mesh, logger=logger,
                      microbatch=train_cfg.get('microbatch'))
    trainer.fit()
    logger.close()


if __name__ == '__main__':
    main()
