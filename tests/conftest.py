"""Test configuration: force an 8-device virtual CPU mesh.

Must set env vars before jax is imported anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache in tests: the XLA:CPU executable
# serializer segfaults the process on cache writes (observed twice,
# 2026-08-21, jax compilation_cache.put_executable_and_time), and the
# package __init__ would re-enable writes after any config set here.
# The env var must be set before object_oriented_slam_tpu is imported.
os.environ.setdefault("OSLAM_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Serial LLVM codegen: two full-suite runs (2026-08-21) died with a
# SIGSEGV inside backend_compile_and_load while compiling a fresh
# program ~40 min into the process (different test each time; the same
# tests pass standalone).  XLA:CPU's parallel codegen splits modules
# onto a thread pool; forcing one split removes the suspected race at
# a small compile-time cost on this 2-core host.
if "xla_cpu_parallel_codegen_split_count" not in flags:
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment's sitecustomize registers an "axon" (remote TPU) PJRT
# plugin and programmatically sets jax_platforms, which overrides the env
# var; force local CPU explicitly for the unit-test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
