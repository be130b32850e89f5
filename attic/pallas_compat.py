"""Mosaic-compatibility shims for pallas kernel bodies.

Provides a float32-accurate polynomial atan2 (Mosaic has no atan/atan2
lowering) and a context manager that swaps it into core.se3's atan2 hook
for the duration of kernel tracing.
"""
from __future__ import annotations

import contextlib

import jax.numpy as jnp

from ...core import se3

# minimax odd polynomial for atan(z), z in [0, 1]; max error ~1e-7 rad
_C = (0.9999993329, -0.3332985605, 0.1994653599, -0.1390853351,
      0.0964200441, -0.0559098861, 0.0218612288, -0.0040540580)


def _atan_01(z):
    z2 = z * z
    p = _C[7]
    for c in _C[6::-1]:
        p = p * z2 + c
    return z * p


def atan2_poly(y, x):
    """Full-quadrant atan2 from the [0,1] polynomial."""
    ay = jnp.abs(y)
    ax = jnp.abs(x)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    a = _atan_01(z)
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(x < 0, jnp.pi - a, a)
    return jnp.where(y < 0, -a, a)


@contextlib.contextmanager
def mosaic_safe_math():
    prev = se3._ATAN2[0]
    se3._ATAN2[0] = atan2_poly
    try:
        yield
    finally:
        se3._ATAN2[0] = prev
