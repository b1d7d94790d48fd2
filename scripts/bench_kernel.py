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


def timeit(fn, *args, n1=5, n2=25):
    import jax
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0
    run(2)
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


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
        f = jax.jit(jax.grad(lambda p, x, t=tile: fused_nerf_raw(
            config, p, x, stash=True, stash_tile=t).sum()))
        report(f'stash fwd+bwd stash_tile={tile}',
               timeit(f, params, pts), flops_bwd)

    for tile in args.bwd_tiles:
        f = jax.jit(jax.grad(lambda p, x, t=tile: fused_nerf_raw(
            config, p, x, stash=False, bwd_tile=t).sum()))
        report(f'recompute fwd+bwd bwd_tile={tile}',
               timeit(f, params, pts), flops_bwd)


if __name__ == '__main__':
    main()
