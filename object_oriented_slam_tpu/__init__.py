"""object_oriented_slam_tpu: a TPU-native object-level SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
XunshanMan/Object-oriented-SLAM ("EllipsoidSLAM"): RGB-D object-level SLAM
with ellipsoid (dual quadric) landmarks, symmetry-aided single-frame
estimation, SVD quadric initialization, and a batched LM bundle-adjustment
backend that shards across TPU device meshes.
"""
import os as _os

# Persistent XLA compilation cache: the axon remote-compile service costs
# seconds-to-minutes per program, so cache executables across processes.
# Disable with OSLAM_NO_COMPILE_CACHE=1.
if not _os.environ.get("OSLAM_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # namespace the cache by a CPU-feature fingerprint: XLA:CPU
        # executables are AOT-compiled for the build machine's features and
        # sessions may resume on different hosts (loading a mismatched AOT
        # result logs a warning per executable and risks SIGILL)
        import hashlib as _hashlib
        import platform as _platform
        _feat = ""
        try:
            with open("/proc/cpuinfo") as _f:
                for _line in _f:
                    if _line.startswith("flags"):
                        _feat = " ".join(sorted(_line.split(":", 1)[1]
                                                .split()))
                        break
        except OSError:
            pass
        _fp = "%s-%s" % (_platform.machine(),
                         _hashlib.sha1(_feat.encode()).hexdigest()[:10])
        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache", _fp))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from . import core  # noqa: F401

__version__ = "0.1.0"
