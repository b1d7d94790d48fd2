#!/usr/bin/env python
"""4-D (time) field-fitting capacity A/B for the temporal grid (CPU-friendly).

Fits a TIME-EVOLVING emission structure (the temporal_closed_loop synth:
streamer amplitude growth + longitude drift) by direct regression — no
renderer — with training times restricted to F discrete frames, and scores:

  * val_trained_t: held-out points AT the trained frame times (capacity)
  * val_unseen_t:  held-out points at the F-1 half-step times (temporal
                   interpolation — the closed loop's generalization axis)

Configs: posenc-only n_freqs_time=2 (the validated temporal encoding),
+ static VM tables (grid_rank — time carried by posenc only), and
+ HexPlane temporal VM tables (grid_time; ops/grid_encoding.py
vm_encode_time). All grid configs use the NGP optimizer recipe
(RESULTS.md capacity A/B: decisive).

Usage: python scripts/probe_temporal_capacity.py [--steps 2000]
       [--batch 2048] [--frames 6] [--out FILE]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def target_field_t(pts, drift=0.5, amp_cycles=0.0):
    """Time-evolving log-emission target: amplitude 1.5->4.0 (optionally
    oscillating amp_cycles times), longitude drifting `drift` rad across
    t in [0, 1] (drift=0.5 = temporal_closed_loop synth_cubes)."""
    import jax.numpy as jnp
    x, y, z, t = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]
    r = jnp.sqrt(x * x + y * y + z * z)
    th = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-6), -1, 1))
    ph = jnp.arctan2(y, x) % (2 * jnp.pi)

    def wrap(a):
        return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi

    a = 1.5 + 2.5 * t
    if amp_cycles:
        a = a * (1.0 + 0.5 * jnp.sin(2 * jnp.pi * amp_cycles * t))
    ph0 = 1.0 + drift * t
    streamer = a * jnp.exp(-wrap(ph - ph0) ** 2 / 0.1
                           - (th - jnp.pi / 2) ** 2 / 0.05)
    rc = jnp.clip(r, 1.0, 1.3)
    log_rho = (1.0 / rc - 1.0) / 0.1 + jnp.log1p(streamer)
    inside = (r >= 1.0) & (r <= 1.3)
    return jnp.where(inside, 2.0 * log_rho, -2.0)


def sample_points(key, n, times):
    """[n, 4] points with t drawn uniformly from the given frame times."""
    import jax
    import jax.numpy as jnp
    kp, kt = jax.random.split(key)
    p = jax.random.uniform(kp, (n, 3), minval=-1.3, maxval=1.3)
    idx = jax.random.randint(kt, (n, 1), 0, len(times))
    t = jnp.asarray(times)[idx]
    return jnp.concatenate([p, t], axis=-1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--steps', type=int, default=2000)
    parser.add_argument('--batch', type=int, default=2048)
    parser.add_argument('--frames', type=int, default=6,
                        help='number of discrete training times (>= 2)')
    parser.add_argument('--lr', type=float, default=1e-3)
    parser.add_argument('--drift', type=float, default=0.5,
                        help='streamer longitude drift [rad] over t in '
                             '[0,1] (0.5 = closed-loop synth; larger = '
                             'temporal structure beyond the posenc bands)')
    parser.add_argument('--amp-cycles', type=float, default=0.0,
                        help='amplitude oscillation cycles over [0,1]')
    parser.add_argument('--only', nargs='+', default=None)
    parser.add_argument('--out', default=None)
    args = parser.parse_args()

    import jax
    if os.environ.get('GRID_CAPACITY_CPU', '1') == '1':
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax

    from sunerf_tpu.models.fields import emission_config, init_nerf, nerf_apply

    F = args.frames
    if F < 2:
        parser.error('--frames must be >= 2 (half-step eval needs a gap)')
    train_times = np.asarray([f / (F - 1) for f in range(F)], np.float32)
    unseen_times = np.asarray([(f + 0.5) / (F - 1) for f in range(F - 1)],
                              np.float32)

    CONFIGS = [
        ('posenc_t2', dict(n_layers=4, d_filter=128, n_freqs_time=2)),
        ('vm_static', dict(n_layers=4, d_filter=128, n_freqs_time=2,
                           grid_sizes=(32,), grid_rank=16, grid_bound=1.3)),
        ('vm_time', dict(n_layers=4, d_filter=128, n_freqs_time=2,
                         grid_sizes=(32,), grid_rank=16, grid_time=8,
                         grid_time_range=(0.0, 1.0), grid_bound=1.3)),
    ]

    val_seen = sample_points(jax.random.key(999), 16384, train_times)
    val_unseen = sample_points(jax.random.key(998), 16384, unseen_times)
    def target(pts):
        return target_field_t(pts, drift=args.drift,
                              amp_cycles=args.amp_cycles)

    y_seen, y_unseen = target(val_seen), target(val_unseen)

    out = {'steps': args.steps, 'batch': args.batch, 'frames': F,
           'lr': args.lr, 'drift': args.drift, 'amp_cycles': args.amp_cycles,
           'recipe': 'table_lr_mult=10 adam_eps=1e-15'}
    for label, kw in CONFIGS:
        if args.only and label not in args.only:
            continue
        config = emission_config(**kw)
        params = init_nerf(jax.random.key(0), config)
        if config.grid_sizes:
            opt = optax.multi_transform(
                {'table': optax.adam(args.lr * 10.0, eps=1e-15),
                 'mlp': optax.adam(args.lr, eps=1e-15)},
                {k: ('table' if k.startswith('grid_') else 'mlp')
                 for k in params})
        else:
            opt = optax.adam(args.lr, eps=1e-15)
        opt_state = opt.init(params)

        def loss_fn(p, pts, y):
            pred = nerf_apply(config, p, pts).raw[:, 0]
            return jnp.mean((pred - y) ** 2)

        @jax.jit
        def step(p, s, key):
            pts = sample_points(key, args.batch, train_times)
            y = target(pts)
            l, g = jax.value_and_grad(loss_fn)(p, pts, y)
            updates, s = opt.update(g, s)
            return optax.apply_updates(p, updates), s, l

        key = jax.random.key(1)
        last = None
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            params, opt_state, last = step(params, opt_state, sub)
        out[label] = {
            'train_mse': round(float(last), 6),
            'val_trained_t': round(float(loss_fn(params, val_seen, y_seen)), 6),
            'val_unseen_t': round(float(loss_fn(params, val_unseen,
                                                y_unseen)), 6),
        }
        print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps(out))
    if args.out:
        with open(args.out, 'w') as fh:
            fh.write(json.dumps(out) + '\n')


if __name__ == '__main__':
    main()
