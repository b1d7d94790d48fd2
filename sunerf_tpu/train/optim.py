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


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr_start: float = 1e-4
    lr_end: float = 1e-5
    lr_iterations: float = 1e6
    lr_floor: float = 5e-5
    grad_clip: float = 0.5


def lr_schedule(config: OptimConfig = OptimConfig()):
    gamma = (config.lr_end / config.lr_start) ** (1.0 / config.lr_iterations)

    def schedule(step):
        return jnp.maximum(config.lr_start * gamma ** step, config.lr_floor)

    return schedule


def make_optimizer(config: OptimConfig = OptimConfig()) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.adam(learning_rate=lr_schedule(config)),
    )
