"""Optimizer and learning-rate schedule.

Reference recipe (sunerf/model/sunerf.py:28-40, run_emission.py:72): Adam with
exponential decay from 1e-4 toward 1e-5 over 1e6 steps, stepped per batch but
floored at 5e-5 (the scheduler stops stepping once the lr reaches the floor),
and global-norm gradient clipping at 0.5.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax
from jax.tree_util import DictKey, tree_map_with_path


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr_start: float = 1e-4
    lr_end: float = 1e-5
    lr_iterations: float = 1e6
    lr_floor: float = 5e-5
    grad_clip: float = 0.5
    # feature-grid table recipe (instant-NGP trains tables at ~10x the MLP
    # lr with a tiny Adam eps — sparse per-cell gradients are strangled by
    # the default eps). Applies to params named grid_* only; 1.0 = off.
    table_lr_mult: float = 1.0
    adam_eps: float = 1e-8


def lr_schedule(config: OptimConfig = OptimConfig()):
    gamma = (config.lr_end / config.lr_start) ** (1.0 / config.lr_iterations)

    def schedule(step):
        return jnp.maximum(config.lr_start * gamma ** step, config.lr_floor)

    return schedule


def _scale_table_updates(mult: float) -> optax.GradientTransformation:
    """Multiply the post-Adam updates of feature-grid tables (param keys
    starting with 'grid_', models/fields.py) by mult — equivalent to a
    higher table learning rate, without splitting the optimizer state."""
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def scale(path, u):
            is_table = any(isinstance(k, DictKey)
                           and str(k.key).startswith('grid_') for k in path)
            return u * mult if is_table else u
        return tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config: OptimConfig = OptimConfig()) -> optax.GradientTransformation:
    steps = [
        optax.clip_by_global_norm(config.grad_clip),
        optax.adam(learning_rate=lr_schedule(config), eps=config.adam_eps),
    ]
    if config.table_lr_mult != 1.0:
        steps.append(_scale_table_updates(config.table_lr_mult))
    return optax.chain(*steps)
