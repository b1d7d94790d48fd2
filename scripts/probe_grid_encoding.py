#!/usr/bin/env python
"""Cost probe for a TPU-native learned feature-grid encoding (ROADMAP r4).

Instant-NGP-style grid encodings are gather-bound, and gathers are
catastrophic on TPU. The TPU-native alternative probed here: per point,
build the TRILINEAR WEIGHT ROW over a small dense grid (8 nonzeros in a
[G^3] row, constructed from pure comparisons — no gather anywhere) and
contract it against the feature table on the MXU:

    feats[N, F] = W[N, G^3] @ table[G^3, F]

W is never materialized globally — a lax.map over point chunks keeps the
peak at [chunk, G^3] (16 MB at chunk=1024, G=16). This probe measures that
cost against the fused-MLP field evaluations it would subsidize, on the
real chip, same-process (tunnel drift cancels).

Usage: python scripts/probe_grid_encoding.py [--n 73728] [--grid 16 24 32]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grid_encode(points, table, grid_size, chunk=1024):
    """Trilinear features from a dense [G^3, F] table — comparison-built
    one-hot contraction, no gathers. points in [-1, 1]^3."""
    import jax
    import jax.numpy as jnp

    G = grid_size
    F = table.shape[-1]
    n = points.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk
    pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))
    cells = jnp.arange(G, dtype=jnp.float32)

    def encode_chunk(p):
        # continuous cell coordinate per axis
        x = (p + 1.0) * 0.5 * (G - 1)            # [C, 3]
        lo = jnp.floor(x)
        frac = x - lo
        # per-axis weight over all G cells: 1-|dist| clamped — exactly the
        # trilinear hat function, nonzero only at the two bracketing cells
        w = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, :, None] - cells))  # [C,3,G]
        # outer product over axes -> [C, G, G, G] -> [C, G^3]
        w3 = (w[:, 0, :, None, None] * w[:, 1, None, :, None]
              * w[:, 2, None, None, :]).reshape(p.shape[0], G * G * G)
        return jnp.matmul(w3, table, precision=jax.lax.Precision.DEFAULT)

    out = jax.lax.map(encode_chunk, pts.reshape(-1, chunk, 3))
    return out.reshape(n_pad, F)[:n]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=73728,
                        help='points per eval (1024 rays x 72 samples)')
    parser.add_argument('--grid', type=int, nargs='+', default=[16, 24, 32])
    parser.add_argument('--features', type=int, default=16)
    parser.add_argument('--chunk', type=int, default=1024)
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import (emission_config, init_nerf,
                                          nerf_apply_fused)

    key = jax.random.key(0)
    pts3 = jax.random.uniform(key, (args.n, 3), minval=-1.0, maxval=1.0)
    pts4 = jnp.concatenate([pts3, jnp.zeros((args.n, 1))], axis=-1)

    from sunerf_tpu.utils.timing import measure_median

    out = {}
    for nl, df in ((6, 384), (2, 128)):
        config = emission_config(n_layers=nl, d_filter=df)
        params = init_nerf(jax.random.key(1), config)
        f = jax.jit(lambda p=params, c=config: nerf_apply_fused(c, p, pts4).raw)
        out[f'mlp_{nl}x{df}'] = round(
            measure_median(f, reps=args.reps) * 1e3, 3)

    for G in args.grid:
        table = jax.random.normal(jax.random.key(2), (G ** 3, args.features))
        f = jax.jit(lambda t=table, g=G: grid_encode(pts3, t, g, args.chunk))
        out[f'grid_{G}^3x{args.features}'] = round(
            measure_median(f, reps=args.reps) * 1e3, 3)

    out['n_points'] = args.n
    print(json.dumps(out))


if __name__ == '__main__':
    main()
