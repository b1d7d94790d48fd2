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
