#!/usr/bin/env python
"""Probe: time the stash forward and stash backward separately to find where
the fwd+bwd path loses efficiency vs the plain forward."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from sunerf_tpu.utils.profiling import timeit_differenced as timeit


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import emission_config, init_nerf
    from sunerf_tpu.ops.pallas import fused_mlp as fm

    config = emission_config()
    params = init_nerf(jax.random.key(0), config)
    mlp_params = {k: params[k] for k in
                  ('w_in', 'b_in', 'w_h', 'b_h', 'w_out', 'b_out')}
    n = 262144
    pts = jax.random.normal(jax.random.key(1), (n, 4), jnp.float32)
    dims = fm._dims_from_config(config)
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 512

    flops_fwd = 2 * n * 512 * (84 + 7 * 512 + 2)

    def report(name, dt, flops):
        print(f'{name:32s} {dt*1e3:8.2f} ms   {flops/dt/1e12:6.1f} TFLOP/s')

    fwd_plain = jax.jit(lambda p, x: fm._fused_mlp_fwd(
        dims, 1024, 256, False, p, x)[0])
    report('plain fwd', timeit(fwd_plain, mlp_params, pts), flops_fwd)

    fwd_stash = jax.jit(lambda p, x: fm._fused_mlp_stash_fwd(
        dims, tile, tile, False, False, 'int8', p, x)[0])
    report(f'stash fwd (tile={tile})', timeit(fwd_stash, mlp_params, pts),
           flops_fwd)

    # precompute residuals once, then time the backward alone
    _, res = jax.jit(lambda p, x: fm._fused_mlp_stash_fwd(
        dims, tile, tile, False, False, 'int8', p, x))(mlp_params, pts)
    g = jnp.ones((n, dims.d_output), jnp.float32)
    bwd = jax.jit(lambda r, gg: fm._fused_mlp_stash_bwd(dims, tile, tile, False, False,
                                                        'int8', r, gg))
    report(f'stash bwd (tile={tile})', timeit(bwd, res, g), 2 * flops_fwd)


if __name__ == '__main__':
    main()
