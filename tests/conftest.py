"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding is exercised without TPU hardware (SURVEY §4: the TPU answer to
'test multi-node without a cluster').

Note: this image preloads jax via a sitecustomize with JAX_PLATFORMS=axon
(remote TPU tunnel), so env vars are too late — use jax.config.update, which
takes effect before the backend initializes (lazily, on first device query).
"""
import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 8)
