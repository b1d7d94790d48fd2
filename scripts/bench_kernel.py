#!/usr/bin/env python
"""Kernel micro-benchmark: fused MLP fwd / fwd+bwd timings at the training
point counts, across tile sizes and backward variants. Run on the real TPU.

All timings fetch-forced (the axon tunnel dispatches asynchronously); each
config is timed by differencing two run lengths to cancel dispatch overhead.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sunerf_tpu.utils.profiling import timeit_differenced as timeit


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--n', type=int, default=262144)
    parser.add_argument('--stash-tiles', type=int, nargs='+',
                        default=[256, 512, 1024, 2048])
    parser.add_argument('--bwd-tiles', type=int, nargs='+', default=[])
    parser.add_argument('--fwd-tiles', type=int, nargs='+', default=[])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import emission_config, init_nerf
    from sunerf_tpu.ops.pallas.fused_mlp import fused_nerf_raw

    config = emission_config()
    params = init_nerf(jax.random.key(0), config)
    n = args.n
    pts = jax.random.normal(jax.random.key(1), (n, 4), jnp.float32)
    flops_fwd = 2 * n * 512 * (84 + 7 * 512 + 2)
    flops_bwd = 3 * flops_fwd

    def report(name, dt, flops):
        print(f'{name:40s} {dt*1e3:8.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s')

    for tile in (args.fwd_tiles or [1024]):
        fwd = jax.jit(lambda p, x, t=tile: fused_nerf_raw(
            config, p, x, tile=t, stash=False).sum())
        report(f'fwd (no grad) tile={tile}', timeit(fwd, params, pts), flops_fwd)

    for tile in args.stash_tiles:
        for fmt in ('int8', 'lsb', 'i8pair'):
            f = jax.jit(jax.grad(lambda p, x, t=tile, m=fmt: fused_nerf_raw(
                config, p, x, stash=True, stash_tile=t,
                stash_format=m).sum()))
            report(f'stash[{fmt}] fwd+bwd stash_tile={tile}',
                   timeit(f, params, pts), flops_bwd)

    # stashing forward alone (pallas fwd wrapper called directly — going
    # through jax.vjp would let XLA DCE the stash outputs)
    from sunerf_tpu.ops.pallas import fused_mlp as fm
    dims = fm._dims_from_config(config)
    mlp = {k: params[k] for k in ('w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out')}
    for tile in args.stash_tiles:
        for fmt in ('int8', 'lsb', 'i8pair'):
            def fwd_only(p, x, t=tile, m=fmt):
                out, (_, _, hs, cs) = fm._fused_mlp_stash_fwd(
                    dims, t, t, False, False, m, p, x)
                extra = hs[0, 0].astype(jnp.float32)
                if cs is not None:
                    extra = extra + cs[0, 0].astype(jnp.float32)
                return out.sum() + extra
            report(f'stash[{fmt}] fwd only stash_tile={tile}',
                   timeit(jax.jit(fwd_only), mlp, pts), flops_fwd)

    for tile in args.bwd_tiles:
        f = jax.jit(jax.grad(lambda p, x, t=tile: fused_nerf_raw(
            config, p, x, stash=False, bwd_tile=t).sum()))
        report(f'recompute fwd+bwd bwd_tile={tile}',
               timeit(f, params, pts), flops_bwd)


if __name__ == '__main__':
    main()
