"""Test harness config: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU (axon) PJRT plugin and the
env pins JAX_PLATFORMS=axon before any test code runs, so plain env-var
overrides are too late; `jax.config.update` still works as long as no
backend has been initialized, which is guaranteed here because conftest is
imported before any test module.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
