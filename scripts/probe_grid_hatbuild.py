#!/usr/bin/env python
"""A/B probe for the grid-encode wyz build strategy (ROADMAP follow-up 2).

The fused kernel builds wyz[t, y*G+z] directly with iota-hat VPU math
(~7 ops per element -> est. ~2.3 ms at 262k points, G=32). The alternative
moves the expansion onto the MXU: build hat rows wy/wz [T, G] (cheap), then
wye = wy @ E1, wze = wz @ E2 with constant 0/1 expansion matrices
(E1[y, y*G+z] = 1, E2[z, y*G+z] = 1), and one VPU multiply — ~1 op/element
VPU + 2*T*G^3 MXU FLOPs x2 (~0.2 ms total). This probe times both as
standalone Pallas kernels (encode only, table matmul included) and checks
they agree in interpret mode.

Usage: python scripts/probe_grid_hatbuild.py [--check] [--n 262144]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def expansion_matrices(G):
    e1 = np.zeros((G, G * G), np.float32)   # wy over y*G+z columns
    e2 = np.zeros((G, G * G), np.float32)   # wz over y*G+z columns
    for y in range(G):
        for z in range(G):
            e1[y, y * G + z] = 1.0
            e2[z, y * G + z] = 1.0
    return e1, e2


def make_encode(G, F, bound, tile, variant, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sunerf_tpu.ops.pallas.fused_mlp import _Dims, _grid_wyz, _hat

    def _mm(a, b):
        return jnp.dot(a.astype(jnp.bfloat16), b,
                       preferred_element_type=jnp.float32)

    def coords(pts):
        scale = 0.5 * (G - 1) / bound
        u = jnp.clip((pts + bound) * scale, 0.0, float(G - 1))
        return u[:, 0:1], u[:, 1:2], u[:, 2:3]

    def kernel_iota(pts_ref, table_ref, out_ref):
        _, uy, uz = coords(pts_ref[:])
        j = jax.lax.broadcasted_iota(jnp.int32, (1, G * G), 1)
        wyz = (_hat(uy, (j // G).astype(jnp.float32))
               * _hat(uz, (j % G).astype(jnp.float32)))
        out_ref[:] = _mm(wyz, table_ref[:])

    def kernel_expand(pts_ref, table_ref, e1_ref, e2_ref, out_ref):
        _, uy, uz = coords(pts_ref[:])
        g = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1).astype(jnp.float32)
        wy = _hat(uy, g)
        wz = _hat(uz, g)
        wyz = _mm(wy, e1_ref[:]) * _mm(wz, e2_ref[:])
        out_ref[:] = _mm(wyz, table_ref[:])

    # the PRODUCTION grid_hat_mxu=True path (ops/pallas/fused_mlp.py
    # _grid_wyz): expansion matrices built in-kernel from iota comparisons
    # instead of passed as operands — what the flag actually ships
    prod_dims = _Dims(d_input=3, d_enc=0, d_filter=0, d_output=0, n_hidden=0,
                      n_freqs=0, scale_factor=1.0, grid_sizes=(G,),
                      grid_features=F, grid_bound=bound, grid_hat_mxu=True)

    def kernel_inkernel(pts_ref, table_ref, out_ref):
        wyz = _grid_wyz(pts_ref[:], prod_dims, G)
        out_ref[:] = _mm(wyz, table_ref[:])

    def encode(table, points, e1=None, e2=None):
        n = points.shape[0]
        n_pad = (n + tile - 1) // tile * tile
        pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        const = lambda i: (0, 0)
        in_specs = [
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G * G, G * F), const, memory_space=pltpu.VMEM),
        ]
        operands = [pts, table]
        kernel = kernel_iota
        if variant == 'expand':
            in_specs += [pl.BlockSpec((G, G * G), const,
                                      memory_space=pltpu.VMEM)] * 2
            operands += [e1, e2]
            kernel = kernel_expand
        elif variant == 'inkernel':
            kernel = kernel_inkernel
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tile, G * F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, G * F), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*operands)
        return out[:n]

    return encode


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=262144)
    parser.add_argument('--grid', type=int, default=32)
    parser.add_argument('--features', type=int, default=8)
    parser.add_argument('--tile', type=int, default=512)
    parser.add_argument('--check', action='store_true')
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import jax
    if args.check:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    interpret = jax.default_backend() != 'tpu'
    G, F = args.grid, args.features
    e1, e2 = expansion_matrices(G)
    e1, e2 = jnp.asarray(e1, jnp.bfloat16), jnp.asarray(e2, jnp.bfloat16)

    if args.check:
        G = 8
        e1, e2 = expansion_matrices(G)
        e1, e2 = jnp.asarray(e1, jnp.bfloat16), jnp.asarray(e2, jnp.bfloat16)
        # bf16 table, matching the production kernel's _prep_grid
        table = jax.random.normal(
            jax.random.key(0), (G * G, G * F)).astype(jnp.bfloat16)
        pts = jax.random.uniform(jax.random.key(1), (200, 3),
                                 minval=-2.0, maxval=2.0)
        a = make_encode(G, F, 1.3, 64, 'iota', True)(table, pts)
        b = make_encode(G, F, 1.3, 64, 'expand', True)(table, pts, e1, e2)
        c = make_encode(G, F, 1.3, 64, 'inkernel', True)(table, pts)
        scale = float(jnp.max(jnp.abs(a)))
        errs = {}
        for name, x in (('expand', b), ('inkernel', c)):
            err = float(jnp.max(jnp.abs(a - x)))
            assert err < 0.02 * scale + 1e-4, (name, err, scale)
            errs[f'max_abs_err_{name}'] = err
        print(json.dumps({'check': 'ok', **errs}))
        return

    from sunerf_tpu.utils.timing import measure_median

    # bf16 table, matching the production kernel's _prep_grid (an f32 table
    # would promote the shared table matmul to the slow f32 MXU path and
    # dilute the A/B)
    table = jax.random.normal(
        jax.random.key(0), (G * G, G * F)).astype(jnp.bfloat16)
    pts = jax.random.uniform(jax.random.key(1), (args.n, 3),
                             minval=-1.2, maxval=1.2)
    out = {'n_points': args.n, 'grid': G, 'tile': args.tile}
    for variant in ('iota', 'expand', 'inkernel'):
        enc = make_encode(G, F, 1.3, args.tile, variant, interpret)
        fn = (jax.jit(lambda t=table: enc(t, pts, e1, e2))
              if variant == 'expand'
              else jax.jit(lambda t=table, e=enc: e(t, pts)))
        out[f'{variant}_ms'] = round(
            measure_median(fn, reps=args.reps) * 1e3, 3)
        print(json.dumps({k: v for k, v in out.items()}), flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
