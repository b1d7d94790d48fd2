"""Training objective: coarse+fine image MSE plus out-of-domain regularization.

Reference semantics (sunerf/model/sunerf.py:98-131,173-206):
  loss = lambda_image * (MSE(coarse, target) + MSE(fine, target))
       + lambda_regularization * mean(regularization)
with asinh image scaling on both prediction and target for the emission head
(sunerf.py:110-116) and raw intensities for the DT head.
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

from sunerf_tpu.core.scaling import image_asinh_scaling


@dataclasses.dataclass(frozen=True)
class LossConfig:
    lambda_image: float = 1.0
    lambda_regularization: float = 1.0
    image_scaling: str = 'asinh'   # 'asinh' (emission) | 'none' (DT)
    scaling_vmax: float = 1.0
    scaling_a: float = 0.005


def scale_image(config: LossConfig, image: jnp.ndarray) -> jnp.ndarray:
    if config.image_scaling == 'asinh':
        return image_asinh_scaling(image, vmax=config.scaling_vmax, a=config.scaling_a)
    if config.image_scaling == 'none':
        return image
    raise ValueError(f'Unknown image scaling {config.image_scaling}')


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def render_loss(config: LossConfig, outputs: dict,
                target_image: jnp.ndarray) -> tuple[jnp.ndarray, dict]:
    """Compute the training loss and scalar metrics from renderer outputs."""
    target = scale_image(config, target_image)
    coarse = scale_image(config, outputs['coarse_image'])
    fine = scale_image(config, outputs['fine_image'])

    coarse_loss = mse(coarse, target)
    fine_loss = mse(fine, target)
    regularization_loss = jnp.mean(outputs['regularization'])

    loss = (config.lambda_image * (coarse_loss + fine_loss)
            + config.lambda_regularization * regularization_loss)
    psnr = -10.0 * jnp.log10(fine_loss)

    metrics = {'loss': loss, 'coarse_loss': coarse_loss, 'fine_loss': fine_loss,
               'regularization_loss': regularization_loss, 'psnr': psnr}
    return loss, metrics
