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
from sunerf_tpu.train.objective import LossConfig, render_loss, table_tv


class TrainState(NamedTuple):
    params: dict       # {'coarse': pytree, 'fine': pytree}
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32
    # spike-guard state (None / absent unless make_train_step(spike_guard=k)
    # built the step): running loss EMA (-1 = uninitialized), the
    # last-HEALTHY (params, opt_state) snapshot the guard rolls back to, and
    # a monotone count of rollbacks — carried in device state so trips
    # between log points stay visible (metrics only sample logged steps).
    loss_ema: Optional[jnp.ndarray] = None
    snapshot: Optional[tuple] = None
    trip_count: Optional[jnp.ndarray] = None
    # Polyak/EMA-averaged copy of params (None unless built with
    # create_train_state(ema=True)): updated inside the jitted step
    # (elementwise lerp — ~free next to the MLP FLOPs, one extra params
    # copy of HBM), evaluated/saved as the smoothed deployment variant.
    # Counter-measure for the measured long-schedule degradation of small
    # fields (RESULTS.md architecture axis: training-ray overfit while
    # re-rendered views degrade — the continuous counterpart to keep_best).
    ema_params: Optional[dict] = None


def create_train_state(params: dict, optimizer: optax.GradientTransformation,
                       spike_guard: bool = False,
                       ema: bool = False) -> TrainState:
    opt_state = optimizer.init(params)
    # the snapshot must not ALIAS params/opt_state buffers: the jitted step
    # donates the whole state, and donating the same buffer through two tree
    # leaves is an XLA error
    snap = (jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, opt_state)) if spike_guard else None
    return TrainState(
        params=params, opt_state=opt_state,
        step=jnp.asarray(0, jnp.int32),
        loss_ema=jnp.asarray(-1.0, jnp.float32),
        snapshot=snap,
        trip_count=jnp.asarray(0, jnp.int32) if spike_guard else None,
        ema_params=jax.tree.map(jnp.copy, params) if ema else None)


def _guarded_update(optimizer, state: TrainState, grads, loss,
                    spike_guard: Optional[float]):
    """Apply the optimizer update; with spike_guard set, detect loss spikes
    and ROLL BACK to the last healthy state.

    Failure mode this guards (observed, deterministic, RESULTS.md round-2
    stability note): at aggressive flat lr the Adam+sine-MLP system can ramp
    its loss x250 within a few tens of steps and never recover. A skip-only
    guard freezes too late — by the time loss exceeds k x EMA the params are
    already destroyed. So the guard keeps a SNAPSHOT of (params, opt_state),
    refreshed only while the batch loss is healthy (<= refresh x EMA, i.e.
    the EMA is tracking, not lagging a ramp), and on a trip
    (loss > k x EMA or non-finite) restores the snapshot wholesale. Training
    then resumes from pre-ramp state on fresh batches/keys; a deterministic
    re-ramp degenerates to fail-closed at the last healthy params.

    Off by default (reference parity: no failure detection upstream,
    SURVEY §5). Returns (params, opt_state, ema, snapshot, tripped)."""
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    if spike_guard is None:
        return params, opt_state, state.loss_ema, state.snapshot, jnp.asarray(0.0)
    ema = state.loss_ema
    fresh = ema < 0
    tripped = ~(jnp.isfinite(loss) & (fresh | (loss <= spike_guard * ema)))
    healthy = jnp.isfinite(loss) & (fresh | (loss <= 1.5 * ema))

    sel = lambda c: (lambda n, o: jax.tree.map(
        lambda a, b: jnp.where(c, a, b), n, o))
    snap_params, snap_opt = state.snapshot
    # trip -> wholesale rollback; otherwise the update stands
    params = sel(tripped)(snap_params, params)
    opt_state = sel(tripped)(snap_opt, opt_state)
    # healthy -> snapshot follows the accepted update
    snapshot = (sel(healthy)(params, snap_params),
                sel(healthy)(opt_state, snap_opt))
    new_ema = jnp.where(fresh, loss, 0.99 * ema + 0.01 * loss)
    # Tripped: the spike must not enter the EMA, but the EMA must GROW (5%)
    # rather than freeze — a frozen EMA latches the guard shut forever when
    # the trigger was inter-batch loss variance rather than a ramp (observed:
    # the DT multi-thermal raw-intensity scene tripped 2980/3000 steps and
    # trained not at all, DT_ABLATION_r3). Consecutive trips now unlatch in
    # O(log(loss/ema)/log(1.05)) steps; a genuine deterministic ramp is
    # unaffected because its trips are NON-consecutive (each rollback is
    # followed by tens of healthy re-ramp steps that keep the EMA tracking).
    new_ema = jnp.where(tripped, ema * 1.05, new_ema)
    return params, opt_state, new_ema, snapshot, tripped.astype(jnp.float32)


def _ema_update(state: TrainState, params, ema_decay: Optional[float]):
    """One Polyak step of the averaged params toward the (post-guard) update.
    Non-learned leaves (the occupancy grid) get averaged too, harmlessly —
    the Trainer substitutes the LIVE grid when rendering/saving the EMA
    variant, since a lagged occupancy grid would change SAMPLING, not just
    smooth the field."""
    if ema_decay is None or state.ema_params is None:
        return state.ema_params
    return jax.tree.map(lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                        state.ema_params, params)


def make_train_step(renderer: Renderer, loss_config: LossConfig,
                    optimizer: optax.GradientTransformation,
                    mesh=None, donate: bool = True,
                    microbatch: Optional[int] = None,
                    spike_guard: Optional[float] = None,
                    ema_decay: Optional[float] = None):
    """Build the jitted train step.

    Args:
        mesh: optional 1-D device mesh; when given, the batch is expected
            sharded on its data axis and params replicated; grads are pmean'd
            over ICI via shard_map. When None, runs single-device.
        microbatch: optional per-chip chunk size: the gradient is accumulated
            over batch//microbatch sequential chunks (lax.scan), bounding
            activation memory for very large ray batches while keeping one
            optimizer step per global batch.
        spike_guard: optional factor k: on a batch loss above k x its
            running EMA (or non-finite), roll params/opt_state back to the
            last healthy snapshot (see _guarded_update). Metrics gain
            'update_skipped' (0/1) when enabled. Requires states built with
            create_train_state(..., spike_guard=True) (snapshot leaf).
        ema_decay: optional Polyak decay d: after each (post-guard) update,
            ema <- d * ema + (1-d) * params. Requires states built with
            create_train_state(..., ema=True) (ema_params leaf).

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
        loss, metrics = render_loss(loss_config, outputs,
                                    batch['target_image'])
        if loss_config.lambda_table_tv:
            tv = table_tv(params)
            loss = loss + loss_config.lambda_table_tv * tv
            metrics = dict(metrics, loss=loss, table_tv=tv)
        return loss, metrics

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
            params, opt_state, ema, snap, tripped = _guarded_update(
                optimizer, state, grads, metrics['loss'], spike_guard)
            trips = state.trip_count
            if spike_guard is not None:
                trips = state.trip_count + tripped.astype(jnp.int32)
                metrics = dict(metrics, update_skipped=tripped,
                               spike_trips=trips.astype(jnp.float32))
            return TrainState(params, opt_state, state.step + 1, ema,
                              snap, trips,
                              _ema_update(state, params, ema_decay)), metrics

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
        params, opt_state, ema, snap, tripped = _guarded_update(
            optimizer, state, grads, metrics['loss'], spike_guard)
        trips = state.trip_count
        if spike_guard is not None:
            trips = state.trip_count + tripped.astype(jnp.int32)
            metrics = dict(metrics, update_skipped=tripped,
                           spike_trips=trips.astype(jnp.float32))
        return TrainState(params, opt_state, state.step + 1, ema,
                          snap, trips,
                          _ema_update(state, params, ema_decay)), metrics

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
