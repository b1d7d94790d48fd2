#!/usr/bin/env python
"""Field-fitting capacity A/B for grid-encoded small MLPs (CPU-friendly).

Fits the psi_193 protocol's analytic emission structure (hydrostatic corona
+ two longitudinal streamers, scripts/psi_protocol.py synth_cubes) DIRECTLY
as a regression target — no renderer — to answer the capacity question
before spending TPU time: do dense feature-grid levels (ops/grid_encoding.py)
let a 4x128 MLP represent what the flagship 8x512 represents?

Reports train MSE and a held-out MSE on fresh points (same distribution;
this probes capacity+optimization, not view generalization).

Usage: python scripts/probe_grid_capacity.py [--steps 1500] [--batch 2048]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def target_field(pts):
    """log-emission-like target from the psi_protocol streamer formula."""
    import jax.numpy as jnp
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    r = jnp.sqrt(x * x + y * y + z * z)
    th = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-6), -1, 1))
    ph = jnp.arctan2(y, x) % (2 * jnp.pi)

    def wrap(a):
        return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi
    streamer = (2.5 * jnp.exp(-wrap(ph - 1.0) ** 2 / 0.1
                              - (th - jnp.pi / 2) ** 2 / 0.05)
                + 1.5 * jnp.exp(-wrap(ph - 3.8) ** 2 / 0.2
                                - (th - jnp.pi / 2) ** 2 / 0.08))
    rc = jnp.clip(r, 1.0, 1.3)
    log_rho = (1.0 / rc - 1.0) / 0.1 + jnp.log1p(streamer)
    inside = (r >= 1.0) & (r <= 1.3)
    return jnp.where(inside, 2.0 * log_rho, -2.0)   # emission ~ rho^2


def sample_points(key, n):
    import jax
    import jax.numpy as jnp
    p = jax.random.uniform(key, (n, 3), minval=-1.3, maxval=1.3)
    t = jnp.zeros((n, 1))
    return jnp.concatenate([p, t], axis=-1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=1500)
    parser.add_argument('--batch', type=int, default=2048)
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--table-lr-mult', type=float, default=1.0,
                        help='lr multiplier for grid tables (instant-NGP '
                             'trains tables at ~10x the MLP lr)')
    parser.add_argument('--adam-eps', type=float, default=1e-8,
                        help='Adam eps (NGP uses 1e-15: table cells see '
                             'sparse tiny gradients that default eps '
                             'strangles)')
    parser.add_argument('--only', nargs='+', default=None,
                        help='subset of config labels to run')
    parser.add_argument('--cpu', action='store_true', default=None)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    if args.cpu or os.environ.get('GRID_CAPACITY_CPU', '1') == '1':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax

    from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply

    CONFIGS = [
        ('4x128', dict(n_layers=4, d_filter=128)),
        ('2x128', dict(n_layers=2, d_filter=128)),
        ('4x128_g16_32', dict(n_layers=4, d_filter=128,
                              grid_sizes=(16, 32), grid_features=8,
                              grid_bound=1.3)),
        ('2x128_g16_32', dict(n_layers=2, d_filter=128,
                              grid_sizes=(16, 32), grid_features=8,
                              grid_bound=1.3)),
        ('4x128_g32', dict(n_layers=4, d_filter=128, grid_sizes=(32,),
                           grid_features=8, grid_bound=1.3)),
        ('6x384', dict(n_layers=6, d_filter=384)),
    ]
    val_pts = sample_points(jax.random.key(999), 16384)
    val_y = target_field(val_pts)

    out = {'steps': args.steps, 'batch': args.batch, 'lr': args.lr,
           'table_lr_mult': args.table_lr_mult, 'adam_eps': args.adam_eps}
    for label, kw in CONFIGS:
        if args.only and label not in args.only:
            continue
        config = emission_config(**kw)
        params = init_nerf(jax.random.key(0), config)
        if args.table_lr_mult != 1.0 and config.grid_sizes:
            opt = optax.multi_transform(
                {'table': optax.adam(args.lr * args.table_lr_mult,
                                     eps=args.adam_eps),
                 'mlp': optax.adam(args.lr, eps=args.adam_eps)},
                {k: ('table' if k.startswith('grid_') else 'mlp')
                 for k in params})
        else:
            opt = optax.adam(args.lr, eps=args.adam_eps)
        opt_state = opt.init(params)

        def loss_fn(p, pts, y):
            pred = nerf_apply(config, p, pts).raw[:, 0]
            return jnp.mean((pred - y) ** 2)

        @jax.jit
        def step(p, s, key):
            pts = sample_points(key, args.batch)
            y = target_field(pts)
            l, g = jax.value_and_grad(loss_fn)(p, pts, y)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, l

        key = jax.random.key(1)
        last = None
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, last = step(params, opt_state, sub)
        val_mse = float(loss_fn(params, val_pts, val_y))
        out[label] = {'train_mse': round(float(last), 6),
                      'val_mse': round(val_mse, 6)}
        print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
