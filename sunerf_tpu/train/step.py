"""The jitted, mesh-sharded training step.

One XLA program per step: sampling -> coarse MLP -> hierarchical resample ->
fine MLP -> quadrature -> loss -> grads -> clip -> Adam. Data parallelism is
GSPMD: ray batches sharded on the batch axis of a 1-D device mesh, parameters
replicated; XLA inserts the gradient all-reduce over ICI. This subsumes the
reference's Lightning 'dp' strategy + per-batch scheduler stepping
(run_emission.py:64-73, sunerf/model/sunerf.py:30-40).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from sunerf_tpu.parallel.mesh import DATA_AXIS, batch_sharding, replicated_sharding
from sunerf_tpu.rendering.renderer import Renderer
from sunerf_tpu.train.objective import LossConfig, render_loss


class TrainState(NamedTuple):
    params: dict       # {'coarse': pytree, 'fine': pytree}
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32
    # running loss EMA for the spike guard; -1 = uninitialized. Present in
    # every state (tree structure stays stable whether the guard is on or
    # off); only updated when make_train_step(spike_guard=...) is set.
    loss_ema: Optional[jnp.ndarray] = None


def create_train_state(params: dict, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.asarray(0, jnp.int32),
                      loss_ema=jnp.asarray(-1.0, jnp.float32))


def _guarded_update(optimizer, state: TrainState, grads, loss,
                    spike_guard: Optional[float]):
    """Apply the optimizer update; with spike_guard set, SKIP it (params,
    opt_state unchanged) when the batch loss exceeds spike_guard x the loss
    EMA — a deterministic Adam+sine-MLP collapse mode observed on the
    SimpleStar closed loop (loss x100 at one step, no recovery; RESULTS.md
    round-2 stability note). The skipped step also leaves the EMA untouched
    so a sustained plateau cannot ratchet the guard open. Off by default
    (reference parity: the reference has no failure detection, SURVEY §5)."""
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    if spike_guard is None:
        return params, opt_state, state.loss_ema, jnp.asarray(0.0)
    ema = state.loss_ema
    ok = jnp.isfinite(loss) & ((ema < 0) | (loss <= spike_guard * ema))
    keep = lambda n, o: jax.tree.map(
        lambda a, b: jnp.where(ok, a, b), n, o)
    params = keep(params, state.params)
    opt_state = keep(opt_state, state.opt_state)
    new_ema = jnp.where(ema < 0, loss, 0.99 * ema + 0.01 * loss)
    new_ema = jnp.where(ok, new_ema, ema)
    return params, opt_state, new_ema, 1.0 - ok.astype(jnp.float32)


def make_train_step(renderer: Renderer, loss_config: LossConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None, donate: bool = True,
                    microbatch: Optional[int] = None,
                    spike_guard: Optional[float] = None):
    """Build the jitted train step.

    Args:
        mesh: optional 1-D device mesh; when given, the batch is expected
            sharded on its data axis and params replicated; grads are pmean'd
            over ICI via shard_map. When None, runs single-device.
        microbatch: optional per-chip chunk size: the gradient is accumulated
            over batch//microbatch sequential chunks (lax.scan), bounding
            activation memory for very large ray batches while keeping one
            optimizer step per global batch.
        spike_guard: optional factor k: skip the optimizer update whenever
            the batch loss exceeds k x its running EMA (see _guarded_update).
            Metrics gain 'update_skipped' (0/1) when enabled.

    Returns:
        step_fn(state, batch, key) -> (state, metrics). batch keys: rays
        [B, 2, 3] (origin, direction), time [B, 1], target_image [B, C]
        (+ wavelength [B, W] for multi-channel heads) — the reference's batch
        layout (sunerf.py:99-101,174-176).
    """

    def single_loss_fn(params, batch, key):
        rays_o, rays_d = batch['rays'][:, 0], batch['rays'][:, 1]
        outputs = renderer(params, rays_o, rays_d, batch['time'], key=key,
                           wavelengths=batch.get('wavelength'))
        return render_loss(loss_config, outputs, batch['target_image'])

    if microbatch is None:
        grad_of_batch = jax.grad(single_loss_fn, has_aux=True)
    else:
        def grad_of_batch(params, batch, key):
            n = batch['rays'].shape[0]
            n_chunks = max(n // microbatch, 1)
            chunks = jax.tree.map(
                lambda x: x[:n_chunks * microbatch].reshape(
                    n_chunks, microbatch, *x.shape[1:]), batch)

            def body(carry, chunk_and_idx):
                grads, metrics = carry
                chunk, idx = chunk_and_idx
                g, m = jax.grad(single_loss_fn, has_aux=True)(
                    params, chunk, jax.random.fold_in(key, idx))
                return (jax.tree.map(jnp.add, grads, g),
                        jax.tree.map(jnp.add, metrics, m)), None

            chunk0 = jax.tree.map(lambda x: x[0], chunks)
            out_shapes = jax.eval_shape(
                jax.grad(single_loss_fn, has_aux=True), params, chunk0, key)
            # batch-derived zero so the carry carries the same shard_map
            # varying-axis type as the per-chunk grads/metrics
            vzero = jnp.sum(batch['time'][:0])
            zero_g, zero_m = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype) + vzero.astype(s.dtype),
                out_shapes)
            (grads, metrics), _ = jax.lax.scan(
                body, (zero_g, zero_m),
                (chunks, jnp.arange(n_chunks)))
            inv = 1.0 / n_chunks
            return (jax.tree.map(lambda g: g * inv, grads),
                    jax.tree.map(lambda m: m * inv, metrics))


    if mesh is None:
        def step_fn(state: TrainState, batch: dict, key: jax.Array):
            key = jax.random.fold_in(key, state.step)
            grads, metrics = grad_of_batch(state.params, batch, key)
            params, opt_state, ema, skipped = _guarded_update(
                optimizer, state, grads, metrics['loss'], spike_guard)
            if spike_guard is not None:
                metrics = dict(metrics, update_skipped=skipped)
            return TrainState(params, opt_state, state.step + 1, ema), metrics

        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    # Mesh path: shard_map, not bare GSPMD — the fused Pallas field kernel is a
    # custom call GSPMD cannot partition; shard_map runs it per-shard and the
    # gradient all-reduce is an explicit psum-mean over ICI.
    def grad_shard(params, batch, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        grads, metrics = grad_of_batch(params, batch, key)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        metrics = jax.lax.pmean(metrics, DATA_AXIS)
        return grads, metrics

    # check_vma=False: the fused field kernel is a pallas custom call whose
    # out_shapes carry no varying-axis metadata; the collective structure here
    # is explicit (pmean on both outputs) so the check adds nothing.
    sharded_grad = jax.shard_map(
        grad_shard, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()), check_vma=False)

    def step_fn(state: TrainState, batch: dict, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        grads, metrics = sharded_grad(state.params, batch, key)
        params, opt_state, ema, skipped = _guarded_update(
            optimizer, state, grads, metrics['loss'], spike_guard)
        if spike_guard is not None:
            metrics = dict(metrics, update_skipped=skipped)
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = TrainState(params=repl, opt_state=repl, step=repl)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(renderer: Renderer, mesh=None):
    """Jitted no-jitter forward pass for validation / full-disk rendering,
    ray-sharded across the mesh when given (tile-parallel rendering)."""

    def eval_fn(params, batch):
        rays_o, rays_d = batch['rays'][:, 0], batch['rays'][:, 1]
        return renderer(params, rays_o, rays_d, batch['time'], key=None,
                        wavelengths=batch.get('wavelength'))

    if mesh is None:
        return jax.jit(eval_fn)
    sharded = jax.shard_map(eval_fn, mesh=mesh,
                            in_specs=(P(), P(DATA_AXIS)),
                            out_specs=P(DATA_AXIS), check_vma=False)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(sharded, in_shardings=(repl, data), out_shardings=data)
