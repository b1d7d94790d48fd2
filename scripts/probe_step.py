#!/usr/bin/env python
"""A/B the full training step across fused-kernel knobs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import (emission_config, init_nerf,
                                          nerf_apply_fused)
    from sunerf_tpu.rendering.emission import EmissionHead
    from sunerf_tpu.rendering.renderer import Renderer
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    config = emission_config()
    batch_size = 1024
    key = jax.random.key(1)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32), (batch_size, 1))
    dirs = jnp.asarray([[-1.0, 0.0, 0.0]]) + 0.15 * jax.random.normal(key, (batch_size, 3))
    rays_d = (dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)).astype(jnp.float32)
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((batch_size, 1), jnp.float32),
             'target_image': jnp.full((batch_size, 1), 0.05, jnp.float32)}

    k1, k2 = jax.random.split(jax.random.key(0))
    params = {'coarse': init_nerf(k1, config), 'fine': init_nerf(k2, config)}
    optimizer = make_optimizer()

    def measure(label, **kw):
        def apply_fn(cfg_params, pts):
            return nerf_apply_fused(config, cfg_params, pts, **kw)
        renderer = Renderer(field_apply=apply_fn, head=EmissionHead())
        step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
        state0 = create_train_state(params, optimizer)

        def run(n):
            state = state0
            m = None
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch, key)
            _ = float(m['loss'])
            return time.perf_counter() - t0
        run(2)
        t1, t2 = run(5), run(25)
        dt = (t2 - t1) / 20
        print(f'{label:40s} {dt*1e3:7.2f} ms/step  {batch_size/dt:9.0f} rays/s')

    import ast
    for spec in sys.argv[1:]:
        kw = ast.literal_eval(spec)
        measure(str(kw), **kw)


if __name__ == '__main__':
    main()
