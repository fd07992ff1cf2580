"""Test env: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/psum) are exercised without TPU hardware (SURVEY §4).

Note: the environment may import jax at interpreter start (sitecustomize)
with a TPU platform pre-selected, so setting JAX_PLATFORMS here is too late;
we must update jax.config before the first backend is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
