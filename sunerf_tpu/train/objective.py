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
    # total-variation penalty on feature-grid tables (grid_* params):
    # the standard few-view fix for grid encodings (Plenoxels/DVGO-style) —
    # dense tables fit training views better than an MLP but generalize
    # worse across views without a smoothness prior (measured: the CPU grid
    # A/B's 5.3 dB train-test gap, RESULTS.md). 0.0 = off.
    lambda_table_tv: float = 0.0


def scale_image(config: LossConfig, image: jnp.ndarray) -> jnp.ndarray:
    if config.image_scaling == 'asinh':
        return image_asinh_scaling(image, vmax=config.scaling_vmax, a=config.scaling_a)
    if config.image_scaling == 'none':
        return image
    raise ValueError(f'Unknown image scaling {config.image_scaling}')


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def table_tv(params: dict) -> jnp.ndarray:
    """Mean squared finite difference over every feature-grid table in the
    params pytree (keys starting with 'grid_' — models/fields.py), averaged
    over the spatial axes and levels. Key-dispatched shapes: dense tables
    [G, G, G, F] (spatial axes 0-2), VM planes [3, G, G, R] (axes 1-2,
    axis 0 indexes orientations), VM lines [3, G, R] (axis 1). Elementwise
    on dense arrays: cheap on the VPU, no gathers."""
    total, n = 0.0, 0
    for sub in params.values():
        if not isinstance(sub, dict):
            continue
        for k, t in sub.items():
            if not k.startswith('grid_'):
                continue
            if k.startswith('grid_planes_') or k.startswith('grid_tplanes_'):
                axes = (1, 2)  # tplanes: axis 2 is time — temporal smoothness
            elif k.startswith('grid_lines_'):
                axes = (1,)
            else:
                axes = (0, 1, 2)
            total = total + sum(jnp.mean(jnp.diff(t, axis=a) ** 2)
                                for a in axes) / len(axes)
            n += 1
    return total / n if n else jnp.asarray(0.0)


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
