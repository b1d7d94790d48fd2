#!/usr/bin/env python
"""Mosaic cost probe: in-VMEM dynamic-slice taps vs the dense separable
contraction for feature-grid encodings (ROADMAP round-4 question).

The dense one-hot contraction (ops/grid_encoding.py) costs 2*N*G^3*F MXU
FLOPs — fine at G<=32, hopeless at 64^3+. The alternative that scales is
instant-NGP's: 8 table taps per point. On TPU that means per-point dynamic
slices from a VMEM-resident table inside a Pallas kernel. This probe
measures that primitive's throughput: for each point, a fori_loop
accumulates its 8 trilinear taps via `pl.ds` loads.

Layout: naive [G^3, F] rows waste 128-F lanes (a 64^3 x 128-lane block is
134 MB — over VMEM), so table rows are PACKED P = 128 // F per VMEM row:
row r lives at [r // P, (r % P) * F : (r % P + 1) * F], shrinking the
64^3 x 8 table block to 8.4 MB at the cost of a dynamic lane offset per tap.

Correctness is pinned against grid_encode_ref in interpret mode (CPU);
timing needs the real chip. If the measured per-tap cost beats
2*G^3*F / MXU_rate at G=64, large grids become viable for round 4.

Usage: python scripts/probe_grid_taps.py [--check] [--n 65536] [--grid 32 64]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tap_encode(grid_size: int, features: int, bound: float,
                    tile: int, interpret: bool):
    """Returns f(packed_table [G^3 // P, 128] f32, points [N, 3]) -> [N, F]
    via per-point dynamic-slice taps (8 per point) from the VMEM-resident
    packed table (P = 128 // features rows per VMEM row)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G, F = grid_size, features
    P = 128 // F
    n_rows = G * G * G // P

    def kernel(pts_ref, table_ref, out_ref):
        pts = pts_ref[:]
        scale = 0.5 * (G - 1) / bound
        u = jnp.clip((pts + bound) * scale, 0.0, float(G - 1))
        lo = jnp.clip(jnp.floor(u), 0.0, float(G - 2))
        frac = u - lo
        lo_i = lo.astype(jnp.int32)

        def body(t, _):
            # 8 corner taps for point t; table rows are (y, z, x) flattened
            # to match grid_encode_ref, then packed P per VMEM row
            ix, iy, iz = lo_i[t, 0], lo_i[t, 1], lo_i[t, 2]
            fx, fy, fz = frac[t, 0], frac[t, 1], frac[t, 2]
            acc = jnp.zeros((1, F), jnp.float32)
            for dy in (0, 1):
                for dz in (0, 1):
                    for dx in (0, 1):
                        w = ((fy if dy else 1.0 - fy)
                             * (fz if dz else 1.0 - fz)
                             * (fx if dx else 1.0 - fx))
                        row = (iy + dy) * (G * G) + (iz + dz) * G + (ix + dx)
                        acc = acc + w * table_ref[
                            pl.ds(row // P, 1), pl.ds((row % P) * F, F)]
            out_ref[pl.ds(t, 1), :] = acc
            return 0

        jax.lax.fori_loop(0, pts.shape[0], body, 0)

    def encode(packed_table, points):
        n = points.shape[0]
        n_pad = (n + tile - 1) // tile * tile
        pts = jnp.pad(points, ((0, n_pad - n), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // tile,),
            in_specs=[
                pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_rows, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, F), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(pts, packed_table)
        return out[:n]

    return encode


def pack_table(table4):
    """[G, G, G, F] (axis order y, z, x, f) -> [G^3 // P, 128] with
    P = 128 // F consecutive rows per VMEM row."""
    import jax.numpy as jnp
    g, f = table4.shape[0], table4.shape[-1]
    p = 128 // f
    return table4.reshape(g * g * g // p, p * f)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=65536)
    parser.add_argument('--grid', type=int, nargs='+', default=[32, 64])
    parser.add_argument('--features', type=int, default=8)
    parser.add_argument('--tile', type=int, default=256)
    parser.add_argument('--check', action='store_true',
                        help='interpret-mode correctness vs grid_encode_ref '
                             '(forces CPU)')
    parser.add_argument('--reps', type=int, default=3)
    args = parser.parse_args()

    import jax
    if args.check:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.utils.timing import measure_median

    interpret = jax.default_backend() != 'tpu'

    if args.check:
        from sunerf_tpu.ops.grid_encoding import grid_encode_ref
        import numpy as np
        G = 8
        table4 = jax.random.normal(jax.random.key(0),
                                   (G, G, G, args.features))
        pts = jax.random.uniform(jax.random.key(1), (300, 3),
                                 minval=-2.0, maxval=2.0)
        enc = make_tap_encode(G, args.features, 2.0, 64, interpret=True)
        got = enc(pack_table(table4), pts)
        want = grid_encode_ref(table4, pts, bound=2.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        print(json.dumps({'check': 'ok', 'max_abs_err': float(
            jnp.max(jnp.abs(got - want)))}))
        return

    pts = jax.random.uniform(jax.random.key(1), (args.n, 3),
                             minval=-1.2, maxval=1.2)
    out = {'n_points': args.n, 'tile': args.tile, 'features': args.features}
    for G in args.grid:
        table4 = jax.random.normal(jax.random.key(2),
                                   (G, G, G, args.features))
        packed = pack_table(table4)
        enc = make_tap_encode(G, args.features, 1.3, args.tile,
                              interpret=interpret)
        f = jax.jit(lambda t=packed: enc(t, pts))
        ms = measure_median(f, reps=args.reps) * 1e3
        out[f'taps_{G}^3_ms'] = round(ms, 3)
        out[f'taps_{G}^3_ns_per_tap'] = round(ms * 1e6 / (args.n * 8), 2)
        print(json.dumps({k: v for k, v in out.items() if str(G) in k}),
              flush=True)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
