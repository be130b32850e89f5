"""Bounding-box measurement calibration.

Re-implementation of ``calibrateMeasurement``
(``/root/reference/src/utils/dataprocess_utils.cpp:150-190``): marks bbox
edges within ``border`` pixels of the image border as invalid (-1) and
rejects boxes smaller than ``size_limit`` pixels.

Provided both as host (numpy) and device (jnp, mask-returning) versions;
the device version is used inside the batched frontend.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def calibrate_measurement_np(measure: np.ndarray, rows: int, cols: int,
                             border: int, size_limit: int):
    """Returns (calibrated_bbox, is_border). bbox coords invalidated to -1."""
    x_len = measure[2] - measure[0]
    y_len = measure[3] - measure[1]
    if x_len < size_limit or y_len < size_limit:
        return np.full(4, -1.0), True

    out = np.full(4, -1.0)
    correct = 0
    if border < measure[0] < cols - 1 - border:
        out[0] = measure[0]; correct += 1
    if border < measure[2] < cols - 1 - border:
        out[2] = measure[2]; correct += 1
    if border < measure[1] < rows - 1 - border:
        out[1] = measure[1]; correct += 1
    if border < measure[3] < rows - 1 - border:
        out[3] = measure[3]; correct += 1
    return out, correct != 4


def calibrate_measurement(measure: jnp.ndarray, rows: int, cols: int,
                          border: int, size_limit: int):
    """jnp version; measure (..., 4) -> (calibrated (...,4), is_border (...))."""
    x_len = measure[..., 2] - measure[..., 0]
    y_len = measure[..., 3] - measure[..., 1]
    too_small = (x_len < size_limit) | (y_len < size_limit)

    lo = jnp.array([border, border, border, border], jnp.float32)
    hi = jnp.array([cols - 1 - border, rows - 1 - border,
                    cols - 1 - border, rows - 1 - border], jnp.float32)
    ok = (measure > lo) & (measure < hi)
    calibrated = jnp.where(ok, measure, -1.0)
    calibrated = jnp.where(too_small[..., None], -1.0, calibrated)
    is_border = too_small | ~jnp.all(ok, axis=-1)
    return calibrated, is_border
