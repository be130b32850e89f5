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
