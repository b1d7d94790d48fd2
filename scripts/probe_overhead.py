#!/usr/bin/env python
"""Where does the step time go at reduced sample budgets?

At the full 64+128 budget the step is fused-MLP-bound (RESULTS.md kernel
facts: non-MLP overhead ~0, fully overlapped). At the quarter budget the
fine-field FLOPs shrink 2.7x but measured throughput only reaches ~160-190k
rays/s — this probe A/Bs fine-field architectures and budgets back-to-back
IN ONE PROCESS (the shared tunnel's throughput drifts ~40% between runs;
same-process interleaved differencing cancels it) to separate fine-MLP time
from everything else (coarse pass, sampling, quadrature, optimizer).

Usage: python scripts/probe_overhead.py [--batch 1024] [--reps 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--batch', type=int, default=1024)
    parser.add_argument('--reps', type=int, default=3)
    parser.add_argument('--n1', type=int, default=5)
    parser.add_argument('--n2', type=int, default=25)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.models.fields import emission_config
    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    B = args.batch
    key = jax.random.key(1)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32), (B, 1))
    dirs = (jnp.asarray([[-1.0, 0.0, 0.0]])
            + 0.15 * jax.random.normal(key, (B, 3)))
    rays_d = (dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
              ).astype(jnp.float32)
    batch = {'rays': jnp.stack([rays_o, rays_d], axis=1),
             'time': jnp.zeros((B, 1), jnp.float32),
             'target_image': jnp.full((B, 1), 0.05, jnp.float32)}
    optimizer = make_optimizer()
    proposal = emission_config(n_layers=4, d_filter=128)

    configs = {
        # name: (model n_layers/d_filter, n_strat, n_hier, proposal?)
        'q_8x512': ((8, 512), 24, 48, True),
        'q_6x384': ((6, 384), 24, 48, True),
        'q_4x256': ((4, 256), 24, 48, True),
        'q_8x512_noprop': ((8, 512), 24, 48, False),
        'full_8x512': ((8, 512), 64, 128, True),
    }
    steps = {}
    for name, ((nl, df), ns, nh, prop) in configs.items():
        renderer, init = make_emission_system(
            model_config=emission_config(n_layers=nl, d_filter=df),
            n_stratified=ns, n_hierarchical=nh,
            coarse_config=proposal if prop else None)
        step = make_train_step(renderer, LossConfig(), optimizer,
                               donate=False)
        steps[name] = (step, create_train_state(init(jax.random.key(0)),
                                                optimizer))

    def measure(step, state0):
        def run(n):
            state = state0
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = step(state, batch, key)
            _ = float(m['loss'])
            return time.perf_counter() - t0
        run(2)  # compile + warm
        return (run(args.n2) - run(args.n1)) / (args.n2 - args.n1)

    # interleave reps so tunnel drift hits every config equally
    times = {name: [] for name in configs}
    for _ in range(args.reps):
        for name, (step, state0) in steps.items():
            times[name].append(measure(step, state0))
    out = {}
    for name, ts in times.items():
        ms = sorted(ts)[len(ts) // 2] * 1e3
        out[name] = {'ms_per_step': round(ms, 3),
                     'rays_per_sec': round(B / (ms / 1e3), 1),
                     'all_ms': [round(t * 1e3, 3) for t in ts]}
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
