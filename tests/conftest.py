"""Test config: run everything on a simulated 8-device CPU mesh.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so we force the
CPU backend through jax.config before any backend is initialized (conftest
runs before test modules import jax code that touches devices).
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
