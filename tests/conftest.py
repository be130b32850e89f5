"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers an "axon" (remote TPU) PJRT
# plugin and programmatically sets jax_platforms, which overrides the env
# var; force local CPU explicitly for the unit-test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Keep persistent-cache READS (fast re-runs) but disable writes: the
# XLA:CPU executable serializer segfaulted the test process mid-suite
# (jax compilation_cache.put_executable_and_time, observed 2026-08-21);
# cache writes only matter for the slow remote-TPU compiles anyway.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
