#!/usr/bin/env python
"""Fused-kernel timing for grid-encoded fields vs plain architectures
(real TPU, same process so tunnel drift cancels).

Times the production training shapes at the step's point count: forward
(inference path) and value_and_grad through the stashing backward, for the
flagship 8x512, the arch-axis 6x384/4x256, and grid-encoded small MLPs
(4x128 / 2x128 with 16^3+32^3 x8 tables). The grid hypothesis
(ops/grid_encoding.py): table features replace most of the MLP's capacity at
~14% of its FLOPs, so quality-per-FLOP improves if PSNR holds.

Usage: python scripts/probe_grid_kernel.py [--n 262144] [--out FILE]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=262144)
    parser.add_argument('--reps', type=int, default=3)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import (emission_config, init_nerf,
                                          nerf_apply_fused)
    from sunerf_tpu.utils.timing import measure_median

    pts = jax.random.uniform(jax.random.key(0), (args.n, 4),
                             minval=-1.2, maxval=1.2)

    CONFIGS = [
        ('8x512', dict(n_layers=8, d_filter=512)),
        ('6x384', dict(n_layers=6, d_filter=384)),
        ('4x256', dict(n_layers=4, d_filter=256)),
        ('4x128_g16_32', dict(n_layers=4, d_filter=128,
                              grid_sizes=(16, 32), grid_features=8)),
        ('2x128_g16_32', dict(n_layers=2, d_filter=128,
                              grid_sizes=(16, 32), grid_features=8)),
        ('4x128_g32', dict(n_layers=4, d_filter=128,
                           grid_sizes=(32,), grid_features=8)),
        ('4x128_g16', dict(n_layers=4, d_filter=128,
                           grid_sizes=(16,), grid_features=8)),
    ]
    out = {'n_points': args.n}
    for label, kw in CONFIGS:
        config = emission_config(**kw)
        params = init_nerf(jax.random.key(1), config)

        fwd = jax.jit(lambda p=params, c=config: nerf_apply_fused(
            c, p, pts, compute_dpts=False).raw)
        out[f'{label}_fwd_ms'] = round(
            measure_median(fwd, reps=args.reps) * 1e3, 3)

        def loss(p, c=config):
            return jnp.mean(nerf_apply_fused(
                c, p, pts, stash=True, compute_dpts=False).raw ** 2)

        def fwd_bwd(p=params):
            # touch every grad so the backward kernel cannot be DCE'd
            v, g = jax.value_and_grad(loss)(p)
            return v + sum(jnp.sum(x) for x in jax.tree.leaves(g))
        step = jax.jit(fwd_bwd)
        out[f'{label}_step_ms'] = round(
            measure_median(step, reps=args.reps) * 1e3, 3)
        print(json.dumps({k: v for k, v in out.items()
                          if k.startswith(label) or k == 'n_points'}),
              flush=True)

    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
