#!/usr/bin/env python
"""Full-training-step A/B for the grid hat-build strategy (ROADMAP grid
follow-up 2): the grid_quarter configuration (proposal 4x128 coarse +
grid-fed 4x128 fine at 24+48) stepped with grid_hat_mxu off vs on.

The encode-only kernel probe (probe_grid_hatbuild.py) isolates the wyz
build; this probe answers the production question — does the constant-
expansion MXU build move the END-TO-END step time at the config that
would ship it?

Usage: python scripts/probe_grid_step.py [--out FILE]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=1024)
    parser.add_argument('--reps', type=int, default=3)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step
    from sunerf_tpu.utils.timing import measure_median

    batch_size = args.batch
    key = jax.random.key(1)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32),
                      (batch_size, 1))
    dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
            + 0.15 * jax.random.normal(key, (batch_size, 3)))
    rays_d = (dirs / jnp.linalg.norm(dirs, axis=-1,
                                     keepdims=True)).astype(jnp.float32)
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((batch_size, 1), jnp.float32),
             'target_image': jnp.full((batch_size, 1), 0.05, jnp.float32)}

    proposal = emission_config(n_layers=4, d_filter=128)
    optimizer = make_optimizer()
    out = {'batch': batch_size, 'config': 'grid_quarter (prop4x128 + '
                                          'grid16+32-fed 4x128 @ 24+48)'}
    for label, hat_mxu in (('iota', False), ('mxu', True)):
        model = emission_config(n_layers=4, d_filter=128,
                                grid_sizes=(16, 32), grid_features=8,
                                grid_bound=1.3, grid_hat_mxu=hat_mxu)
        renderer, init = make_emission_system(
            model_config=model, n_stratified=24, n_hierarchical=48,
            coarse_config=proposal)
        params = init(jax.random.key(0))
        step = make_train_step(renderer, LossConfig(), optimizer,
                               donate=False)
        state = create_train_state(params, optimizer)

        def fn(s=step, st=state):
            new_state, metrics = s(st, batch, key)
            return metrics['loss']

        ms = measure_median(fn, reps=args.reps) * 1e3
        out[f'{label}_step_ms'] = round(ms, 3)
        out[f'{label}_rays_per_sec'] = round(batch_size / (ms / 1e3), 1)
        print(json.dumps(out), flush=True)

    if 'iota_step_ms' in out and 'mxu_step_ms' in out:
        out['mxu_speedup'] = round(out['iota_step_ms'] / out['mxu_step_ms'], 3)
    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as fh:
            json.dump(out, fh, indent=2)


if __name__ == '__main__':
    main()
