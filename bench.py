"""Benchmark: training-step ray throughput on one chip at the reference
workload (SURVEY §6 / BASELINE.md constants).

Workload: emission SuNeRF — 2x (8x512 Sine MLP, posenc 4->84), 64 stratified +
128 hierarchical samples per ray (fine pass integrates 192), full coarse+fine
forward + backward + Adam update. ~0.96 GFLOP/ray forward, ~2.9 GFLOP/ray
with backward.

Timing: the axon TPU tunnel dispatches asynchronously and block_until_ready
returns before remote execution completes, so we difference two run lengths
(N1 vs N2 steps) each terminated by a scalar host fetch — the fetch forces the
chain; the difference cancels fixed dispatch/fetch overhead.

Baseline: the reference publishes no throughput (BASELINE.md). We pin the
comparison constant to an estimated 10,000 rays/s for the PyTorch reference on
one A100 (2.9 GFLOP/ray fwd+bwd at ~30% of 100 TFLOP/s effective — f32 torch
eager with per-step host sync), so vs_baseline = rays_per_sec / 10_000. The
north star is >=10x (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

ESTIMATED_REFERENCE_RAYS_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    # Mosaic remote compiles through the axon tunnel take minutes cold; the
    # persistent cache makes reruns fast.
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from sunerf_tpu.systems import make_emission_system
    from sunerf_tpu.train.objective import LossConfig
    from sunerf_tpu.train.optim import make_optimizer
    from sunerf_tpu.train.step import create_train_state, make_train_step

    batch_size = 1024  # reference emission default (single_channel.py:17)
    renderer, init = make_emission_system()
    params = init(jax.random.key(0))
    optimizer = make_optimizer()
    step = make_train_step(renderer, LossConfig(), optimizer, donate=False)
    state0 = create_train_state(params, optimizer)

    key = jax.random.key(1)
    rays_o = jnp.tile(jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32), (batch_size, 1))
    dirs = jnp.asarray([[-1.0, 0.0, 0.0]]) + 0.15 * jax.random.normal(key, (batch_size, 3))
    rays_d = (dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)).astype(jnp.float32)
    batch = {
        'rays': jnp.stack([rays_o, rays_d], axis=1),
        'time': jnp.zeros((batch_size, 1), jnp.float32),
        'target_image': jnp.full((batch_size, 1), 0.05, jnp.float32),
    }

    def run(n_steps):
        state = state0
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch, key)
        _ = float(metrics['loss'])  # host fetch forces the whole chain
        return time.perf_counter() - t0

    run(2)  # warmup: compiles step + fetch path
    n1, n2 = 5, 25
    t1, t2 = run(n1), run(n2)
    per_step = (t2 - t1) / (n2 - n1)
    rays_per_sec = batch_size / per_step

    print(json.dumps({
        'metric': 'train_rays_per_sec_per_chip',
        'value': round(rays_per_sec, 1),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_sec / ESTIMATED_REFERENCE_RAYS_PER_SEC, 3),
    }))


if __name__ == '__main__':
    main()
