"""Plane (pi^T X = 0) operations as pure JAX functions.

TPU-native re-design of the reference ``g2o::plane``
(``/root/reference/src/core/Plane.cpp``, ``include/core/Plane.h``).

A plane is a ``(4,)`` array ``[A, B, C, D]`` with ``AX+BY+CZ+D=0``.  Mirrors
the reference's construction, transform, distance, and the azimuth/elevation
``oplus`` updates used by the symmetry-plane optimizer.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import se3

_EPS = 1e-8


def from_point_normal(point: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Plane.cpp:83-90."""
    d = -jnp.dot(point, normal)
    return jnp.concatenate([normal, d[None]])


def from_dis_angle(dis, angle):
    """Plane.cpp:92-105 (fromDisAngleTrans with trans handled separately):
    normal = (sin a, -cos a, 0), D = -dis."""
    return jnp.stack([jnp.sin(angle), -jnp.cos(angle),
                      jnp.zeros_like(angle), -dis])


def distance_to_point(pi: jnp.ndarray, p: jnp.ndarray,
                      keep_flag: bool = False) -> jnp.ndarray:
    """Signed (keep_flag) or absolute point-plane distance (Plane.cpp:108-115).

    ``p`` may be (3,) or (..., 3).
    """
    num = p @ pi[:3] + pi[3] if p.ndim > 1 else jnp.dot(p, pi[:3]) + pi[3]
    den = jnp.maximum(jnp.linalg.norm(pi[:3]), _EPS)
    val = num / den
    return val if keep_flag else jnp.abs(val)


def transform(pi: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """pi' = (T^T)^-1 pi, T = pose7 mapping local points to global
    (Plane.cpp:117-122)."""
    M = se3.se3_to_mat(T)
    return jnp.linalg.solve(M.T, pi)


def normalize(pi: jnp.ndarray) -> jnp.ndarray:
    """Scale so the normal has unit length (Plane.h:78-81)."""
    return pi / jnp.maximum(jnp.linalg.norm(pi[:3]), _EPS)


def azimuth(pi: jnp.ndarray) -> jnp.ndarray:
    """atan2(B, A) (Plane.h:94-96)."""
    return jnp.arctan2(pi[1], pi[0])


def distance(pi: jnp.ndarray) -> jnp.ndarray:
    """-D (Plane.h:104-106)."""
    return -pi[3]


def _rotation_of_normal(n: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(azimuth) * Ry(-elevation) (Plane.h:88-92)."""
    az = jnp.arctan2(n[1], n[0])
    el = jnp.arctan2(n[2], jnp.linalg.norm(n[:2]))
    ca, sa = jnp.cos(az), jnp.sin(az)
    ce, se_ = jnp.cos(-el), jnp.sin(-el)
    Rz = jnp.array([[ca, -sa, 0.0], [sa, ca, 0.0], [0.0, 0.0, 1.0]])
    Ry = jnp.array([[ce, 0.0, se_], [0.0, 1.0, 0.0], [-se_, 0.0, ce]])
    return Rz @ Ry


def oplus(pi: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """3-DoF update [azimuth, elevation, ddistance] (Plane.h:45-59).

    Builds a unit normal from (azimuth, elevation) in the frame of the current
    normal, rotates it back, and bumps the distance.
    """
    az, el = v[0], v[1]
    s, c = jnp.sin(el), jnp.cos(el)
    n = jnp.stack([c * jnp.cos(az), c * jnp.sin(az), s])
    R = _rotation_of_normal(pi[:3])
    d = distance(pi) + v[2]
    out = jnp.concatenate([R @ n, -d[None]])
    return normalize(out)


def oplus_2dof(pi: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """The VertexPlane update: [azimuth, distance] with elevation pinned to 0
    (SymmetrySolver.cpp:527-532)."""
    return oplus(pi, jnp.stack([v2[0], jnp.zeros_like(v2[0]), v2[1]]))


def oplus_dual(pi: jnp.ndarray, dual_dis: jnp.ndarray,
               v3: jnp.ndarray):
    """VertexDualPlane update: [azimuth, ddistance, ddual_dis] with
    elevation 0 (Plane.h:61-76, SymmetrySolver.cpp:544-547).

    Returns (new_plane, new_dual_dis).
    """
    new_pi = oplus(pi, jnp.stack([v3[0], jnp.zeros_like(v3[0]), v3[1]]))
    return new_pi, dual_dis + v3[2]


def dual_other_plane(pi: jnp.ndarray, dual_dis: jnp.ndarray) -> jnp.ndarray:
    """Second plane of a dual-reflection pair: same azimuth, distance=dual_dis
    (Plane.cpp:137-144 GenerateAnotherPlaneVec)."""
    return from_dis_angle(dual_dis, azimuth(pi))


def mirror_points(pi: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Reflect points (..., 3) across the plane
    (SymmetrySolver.cpp:193-214 GetSymmetryPointOfPlane).

    Equivalent closed form: p' = p - 2 (n.p + d) n / |n|^2.
    """
    n = pi[:3]
    n2 = jnp.maximum(jnp.dot(n, n), _EPS)
    s = (pts @ n + pi[3]) / n2
    return pts - 2.0 * s[..., None] * n
