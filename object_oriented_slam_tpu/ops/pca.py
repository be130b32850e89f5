"""Masked PCA and the reference's rotation post-processing.

Replaces ``ProcessPCA`` (src/pca/EllipsoidExtractor.cpp:170-196: PCL
normalized covariance + eigendecomposition), ``AdjustChirality`` (:760-764),
``AlignZAxisToGravity`` (:207-267) and ``calibRotMatAccordingToGroundPlane``
(:766-788), as pure jnp functions over masked point sets.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import linalg

_EPS = 1e-9


class PCAResult(NamedTuple):
    center: jnp.ndarray      # (3,)
    rot: jnp.ndarray         # (3,3) columns = axes
    eigvals: jnp.ndarray     # (3,) ascending (normalized covariance)


def masked_pca(pts: jnp.ndarray, mask: jnp.ndarray) -> PCAResult:
    """Centroid + normalized-covariance eigendecomposition."""
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    c = jnp.sum(pts * w[:, None], axis=0) / n
    d = (pts - c) * w[:, None]
    cov = (d.T @ d) / n  # "normalized" covariance like PCL
    # closed-form eigensolver: jnp.linalg.eigh's iterative factorization
    # runs as a serial scalar loop on TPU and sat on the per-frame
    # extraction critical path (one 3x3 eigh per detection per frame)
    vals, vecs = linalg.eigh3(cov)
    return PCAResult(center=c, rot=vecs, eigvals=vals)


def adjust_chirality(rot: jnp.ndarray) -> jnp.ndarray:
    """col2 = col0 x col1 (EllipsoidExtractor.cpp:760-764)."""
    return rot.at[:, 2].set(jnp.cross(rot[:, 0], rot[:, 1]))


def align_z_to_gravity(rot: jnp.ndarray, eigvals: jnp.ndarray,
                       z_axis: jnp.ndarray):
    """Permute axes so the column most parallel to ``z_axis`` becomes z
    (EllipsoidExtractor.cpp:207-267). Returns (rot', eigvals')."""
    z = z_axis / jnp.maximum(jnp.linalg.norm(z_axis), _EPS)
    cos = rot.T @ z                      # (3,)
    max_id = jnp.argmax(jnp.abs(cos))
    sign = jnp.where(cos[max_id] > 0, 1.0, -1.0)

    z_col = sign * rot[:, max_id]
    x_id = (max_id + 1) % 3
    y_id = (max_id + 2) % 3
    x_col = rot[:, x_id]
    y_col = jnp.cross(z_col, x_col)

    new_rot = jnp.stack([x_col, y_col, z_col], axis=1)
    new_vals = jnp.stack([eigvals[x_id], eigvals[y_id], eigvals[max_id]])
    return new_rot, new_vals


def calibrate_to_normal(rot: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Small rotation making column z exactly parallel to ``normal``
    (EllipsoidExtractor.cpp:766-788)."""
    z = rot[:, 2]
    axis = jnp.cross(z, normal)
    axis_n = jnp.linalg.norm(axis)
    axis = axis / jnp.maximum(axis_n, _EPS)
    cos_t = jnp.clip(jnp.dot(normal, z)
                     / jnp.maximum(jnp.linalg.norm(normal)
                                   * jnp.linalg.norm(z), _EPS), -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Rodrigues
    Kx = jnp.array([[0, -axis[2], axis[1]],
                    [axis[2], 0, -axis[0]],
                    [-axis[1], axis[0], 0]])
    R = (jnp.eye(3) + jnp.sin(theta) * Kx
         + (1 - jnp.cos(theta)) * (Kx @ Kx))
    # degenerate (already aligned): identity
    R = jnp.where(axis_n > _EPS, R, jnp.eye(3))
    return R @ rot


def normalized_frame_stats(pts: jnp.ndarray, mask: jnp.ndarray):
    """RMS + max-extent per axis in the normalized object frame
    (ProcessPCANormalized, EllipsoidExtractor.cpp:495-531).

    Returns (rms (3,), max_extent (3,)) -- the reference uses max_extent as
    the ellipsoid scale.
    """
    w = mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    rms = jnp.sum(pts * pts * w[:, None], axis=0) / n
    mx = jnp.max(jnp.abs(pts) * w[:, None], axis=0)
    return rms, mx
