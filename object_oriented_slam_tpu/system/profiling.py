"""Device profiling hooks (SURVEY.md section 5: the reference has only
commented-out clock() deltas; here jax.profiler traces are first-class)."""
from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/XProf format) around a
    block of device work.

    Usage:
        with device_trace("/tmp/slam_trace"):
            slam.track_with_objects(...)
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        yield log_dir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


def annotate(name: str):
    """TraceAnnotation context for labeling pipeline stages in traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
