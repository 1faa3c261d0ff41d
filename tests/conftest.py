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

# Persistent compile cache for the CPU test backend: the fast tier's cost
# is dominated by XLA CPU compiles of the full model / both-formulation
# parity pairs (30 s for the test_model fixture alone), repaid on every
# run.  Separate dir from the TPU cache (.jax_cache) — executables are
# backend-specific.  Also drops tracebacks from MLIR locations so cached
# entries survive unrelated source edits (see utils.enable_compile_cache).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_include_full_tracebacks_in_locations", False)
