"""Point-cloud filters.

Replaces the remaining PCL helpers of ``src/symmetry/PointCloudFilter.cpp``:
  * statistical outlier removal (:263-276): drop points whose mean k-NN
    distance exceeds mean + stddev_mul * std of the population
  * keep-points-inside-quadric ``FiltPointsInBox`` (:278-300)
and the range-image border extraction of ``src/symmetry/BorderExtractor.cpp``
(:58-132), which becomes a depth-discontinuity test on the organized image.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import se3


def statistical_outlier_mask(pts: jnp.ndarray, mask: jnp.ndarray,
                             k: int = 20, stddev_mul: float = 1.0):
    """Inlier mask via mean-of-kNN-distance thresholding (masked, O(N^2)).

    The distance matrix form replaces PCL's KdTree; N is the fixed cloud
    capacity so the top-k runs as one batched sort.
    """
    d2 = (jnp.sum(pts * pts, axis=1)[:, None]
          + jnp.sum(pts * pts, axis=1)[None, :]
          - 2.0 * pts @ pts.T)
    d2 = jnp.where(mask[None, :], d2, jnp.inf)
    d2 = jnp.where(jnp.eye(pts.shape[0], dtype=bool), jnp.inf, d2)
    d2_sorted = jnp.sort(d2, axis=1)[:, :k]
    finite = jnp.isfinite(d2_sorted)
    dmean = jnp.sum(jnp.where(finite, jnp.sqrt(jnp.maximum(d2_sorted, 0.0)),
                              0.0), axis=1) / jnp.maximum(
        jnp.sum(finite, axis=1), 1)
    valid = mask & (jnp.sum(finite, axis=1) > 0)

    n = jnp.maximum(jnp.sum(valid), 1.0)
    mu = jnp.sum(jnp.where(valid, dmean, 0.0)) / n
    var = jnp.sum(jnp.where(valid, (dmean - mu) ** 2, 0.0)) / n
    thresh = mu + stddev_mul * jnp.sqrt(var)
    return valid & (dmean <= thresh)


def points_inside_quadric_mask(pts: jnp.ndarray, mask: jnp.ndarray,
                               e_vec10: jnp.ndarray):
    """FiltPointsInBox: keep points X with X^T Q X <= 0 (inside the
    ellipsoid), PointCloudFilter.cpp:278-300."""
    Tow = se3.se3_inv(e_vec10[:7])
    R = se3.quat_to_mat(Tow[3:])
    local = pts @ R.T + Tow[:3]
    v = local / jnp.maximum(e_vec10[7:10], 1e-9)
    return mask & (jnp.sum(v * v, axis=1) <= 1.0)


def depth_border_mask(depth: jnp.ndarray, scale: float,
                      jump: float = 0.1):
    """Range-image border pixels: depth discontinuity above ``jump`` meters
    against any 4-neighbour (BorderExtractor analogue)."""
    z = depth.astype(jnp.float32) / scale
    valid = z > 1e-6
    border = jnp.zeros_like(valid)
    for shift, axis in [(1, 0), (-1, 0), (1, 1), (-1, 1)]:
        zn = jnp.roll(z, shift, axis=axis)
        vn = jnp.roll(valid, shift, axis=axis)
        border = border | (valid & vn & (jnp.abs(z - zn) > jump))
        border = border | (valid & ~vn)
    return border
