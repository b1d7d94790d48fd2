"""sunerf_tpu — TPU-native rebuild of SuNeRF (FrontierDevelopmentLab/2024-HL-SPI3S-SuNeRF).

A JAX/XLA/Pallas framework that learns 4D (x, y, z, t) neural radiance fields of
the solar atmosphere from multi-viewpoint EUV images, integrating physical
radiative-transfer equations along each ray instead of RGB-alpha compositing.

Package map (reference layer in parens, see SURVEY.md):
  core/        geometry, ray sampling, encodings, unit scaling   (L4)
  models/      NeRF field MLPs + analytic/simulation stand-ins   (L3)
  rendering/   differentiable radiative-transfer heads + renderer (L2)
  ops/         fused Pallas kernels, interpolation primitives
  parallel/    device-mesh sharding, data-parallel train step    (replaces nn.DataParallel)
  train/       training loop, losses, metrics, schedules          (L1)
  data/        FITS/genx IO, ray-shard datasets, loaders          (L5/L6)
  evaluation/  checkpoint loaders, full-disk/flyby rendering      (L7)
"""

__version__ = "0.1.0"

# public API (lazy: importing sunerf_tpu must not pull jax before the caller
# has a chance to configure platforms/caches)
_PUBLIC = {
    'make_emission_system': 'sunerf_tpu.systems',
    'make_density_temperature_system': 'sunerf_tpu.systems',
    'make_simple_star_renderer': 'sunerf_tpu.systems',
    'make_thomson_system': 'sunerf_tpu.systems',
    'make_mhd_renderer': 'sunerf_tpu.systems',
    'from_spec': 'sunerf_tpu.systems',
    'Renderer': 'sunerf_tpu.rendering.renderer',
    'SuNeRFLoader': 'sunerf_tpu.evaluation.loader',
    'ModelLoader': 'sunerf_tpu.evaluation.loader',
    'Trainer': 'sunerf_tpu.train.loop',
    'TrainerConfig': 'sunerf_tpu.train.loop',
}


def __getattr__(name):
    if name in _PUBLIC:
        import importlib
        return getattr(importlib.import_module(_PUBLIC[name]), name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')
