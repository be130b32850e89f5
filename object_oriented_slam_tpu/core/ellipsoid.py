"""Ellipsoid (dual quadric) operations as pure JAX functions.

TPU-native re-design of the reference ``g2o::ellipsoid``
(``/root/reference/src/core/Ellipsoid.cpp``, ``include/core/Ellipsoid.h``).

Representation: an ellipsoid is a ``(10,)`` float32 array
``[tx, ty, tz, qx, qy, qz, qw, sa, sb, sc]`` ("vec10") -- translation,
unit quaternion, half-axis scales -- identical to the reference's
``toVector()`` layout (Ellipsoid.cpp:152-157).  A "minimal" 9-vector is
``[x, y, z, roll, pitch, yaw, sa, sb, sc]`` (Ellipsoid.cpp:16-22,144-149).

All functions are pure, closed-form and differentiable, so analytic jacobians
come for free via ``jax.jacfwd`` (the reference relies on g2o's numeric
differentiation).  Batch by ``vmap`` over the leading axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Parameterisation conversions
# ---------------------------------------------------------------------------

def from_minimal(v9: jnp.ndarray) -> jnp.ndarray:
    """minimal vec9 (xyz-rpy-abc) -> vec10 (Ellipsoid.cpp:16-22)."""
    q = se3.zyx_euler_to_quat(v9[3], v9[4], v9[5])
    return jnp.concatenate([v9[:3], q, v9[6:9]])


def to_minimal(e: jnp.ndarray) -> jnp.ndarray:
    """vec10 -> minimal vec9 (Ellipsoid.cpp:144-149)."""
    rpy = se3.quat_to_euler_zyx(e[3:7])
    return jnp.concatenate([e[:3], rpy, e[7:10]])


def pose_of(e: jnp.ndarray) -> jnp.ndarray:
    return e[:7]


def scale_of(e: jnp.ndarray) -> jnp.ndarray:
    return e[7:10]


def make(pose7: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pose7, scale])


# ---------------------------------------------------------------------------
# Updates and errors (the optimizer's oplus / residuals)
# ---------------------------------------------------------------------------

def exp_update(e: jnp.ndarray, u9: jnp.ndarray) -> jnp.ndarray:
    """SE3 right-multiplicative update + additive scale (Ellipsoid.cpp:38-47).

    ``u9 = [omega(3), upsilon(3), dscale(3)]`` -- rotation first, matching
    ``SE3Quat::exp`` ordering.
    """
    new_pose = se3.se3_mul(pose_of(e), se3.se3_exp(u9[:6]))
    return make(new_pose, scale_of(e) + u9[6:9])


def exp_update_xyzabc(e: jnp.ndarray, u6: jnp.ndarray) -> jnp.ndarray:
    """6-DoF update variant: translation-only SE3 exp + additive scale
    (VertexEllipsoidXYZABC, Ellipsoid.cpp:50-61)."""
    u9 = jnp.concatenate([jnp.zeros(3, dtype=u6.dtype), u6[:3], u6[3:6]])
    return exp_update(e, u9)


def log_error_9dof(e: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """9-DoF log error between two ellipsoids (Ellipsoid.cpp:63-71).

    ``res[:6] = log(other.pose^-1 * e.pose)``, ``res[6:] = e.scale - other.scale``.
    """
    pose_diff = se3.se3_mul(se3.se3_inv(pose_of(other)), pose_of(e))
    return jnp.concatenate([se3.se3_log(pose_diff), scale_of(e) - scale_of(other)])


def rotate_yaw(e: jnp.ndarray, k: int) -> jnp.ndarray:
    """Rotate the body frame about its z axis by k*90deg (Ellipsoid.cpp:75-90).

    For k = +-1 (i.e. +-90 deg) the x/y half-axes are swapped so the rotated
    ellipsoid represents the identical shape.
    """
    import math
    yaw = k * math.pi / 2.0
    s_h = math.sin(yaw * 0.5)
    c_h = math.cos(yaw * 0.5)
    z = e[0] * 0.0  # traced zero: avoids a captured const array in pallas
    rot = jnp.stack([z, z, z, z, z, z + s_h, z + c_h])
    new_pose = se3.se3_mul(pose_of(e), rot)
    s = scale_of(e)
    if k % 2 != 0:
        s = jnp.stack([s[1], s[0], s[2]])
    return make(new_pose, s)


def min_log_error_9dof(e: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
    """Rotation-ambiguity-aware 9-DoF error (Ellipsoid.cpp:92-117).

    Tries rotating ``other`` by {-90, 0, 90, 180} deg yaw and returns the error
    vector of minimum norm.  The argmin selection is stopped from gradient flow
    so jacobians differentiate only through the chosen branch, mirroring the
    reference's behavior of evaluating jacobians at the selected rotation.
    """
    errs = jnp.stack([log_error_9dof(e, rotate_yaw(other, k)) for k in (-1, 0, 1, 2)])
    norms = jnp.linalg.norm(errs, axis=1)
    idx = jax.lax.stop_gradient(jnp.argmin(norms))
    return errs[idx]


# ---------------------------------------------------------------------------
# Frame transforms
# ---------------------------------------------------------------------------

def transform_from(e: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Local -> global given T (e.g. Twc) (Ellipsoid.cpp:120-129)."""
    return make(se3.se3_mul(T, pose_of(e)), scale_of(e))


def transform_to(e: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Global -> local given T=Twc (Ellipsoid.cpp:132-141)."""
    return make(se3.se3_mul(se3.se3_inv(T), pose_of(e)), scale_of(e))


# ---------------------------------------------------------------------------
# Quadric / projection
# ---------------------------------------------------------------------------

def quadric_Qstar(e: jnp.ndarray) -> jnp.ndarray:
    """Dual quadric Q* = T diag(a^2,b^2,c^2,-1) T^T (Ellipsoid.cpp:290-300)."""
    s = scale_of(e)
    Qc_star = jnp.diag(jnp.concatenate([s * s, jnp.array([-1.0], dtype=e.dtype)]))
    T = se3.se3_to_mat(pose_of(e))
    return T @ Qc_star @ T.T


def projection_matrix(pose_cw: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """P = K [I|0] Tcw, 3x4 (Ellipsoid.cpp:276-287)."""
    Tcw = se3.se3_to_mat(pose_cw)
    return K @ Tcw[:3, :]


def project_center(e: jnp.ndarray, pose_cw: jnp.ndarray,
                   K: jnp.ndarray) -> jnp.ndarray:
    """Image point of the ellipsoid center (Ellipsoid.cpp:195-205)."""
    P = projection_matrix(pose_cw, K)
    u = P @ jnp.concatenate([e[:3], jnp.array([1.0], dtype=e.dtype)])
    return u[:2] / u[2]


def _conic_cstar(e: jnp.ndarray, pose_cw: jnp.ndarray,
                 K: jnp.ndarray) -> jnp.ndarray:
    """Dual conic C* = P Q* P^T in closed form.

    With Q* = [[R S^2 R^T - t t^T, -t], [-t^T, -1]] and P = K [R_cw | t_cw],
    the product collapses to C* = (W S)(W S)^T - v v^T where W = K R_cw R
    and v = K (R_cw t + t_cw) -- three small matmuls instead of 4x4
    homogeneous chains, an ~3x op-count cut in the BA hot loop.
    """
    R = se3.quat_to_mat(e[3:7])
    R_cw = se3.quat_to_mat(pose_cw[3:])
    A = se3._mm3(K, R_cw)
    W = se3._mm3(A, R)
    WS = W * e[7:10][None, :]
    v = se3._mv(A, e[:3]) + se3._mv(K, pose_cw[:3])
    return se3._mm3(WS, jnp.swapaxes(WS, -1, -2)) - v[:, None] * v[None, :]


def project_ellipse(e: jnp.ndarray, pose_cw: jnp.ndarray,
                    K: jnp.ndarray) -> jnp.ndarray:
    """Project to an image ellipse [x_c, y_c, theta, axis1, axis2].

    Conic C = (P Q* P^T)^-1 normalized by C(2,2), then closed-form
    conic -> ellipse parameter extraction (Ellipsoid.cpp:209-249; same
    coefficient formulas, kept verbatim for behavioral parity).
    """
    C_star = _conic_cstar(e, pose_cw, K)
    # closed-form 3x3 inverse: LU-based jnp.linalg.inv serializes on TPU when
    # vmapped over every edge of the BA graph (ops/linalg.py)
    from ..ops.linalg import inv3
    C = inv3(C_star)
    C = C / C[2, 2]

    a = C[0, 0]
    b = C[0, 1] * 2.0
    c = C[1, 1]
    d = C[0, 2] * 2.0
    ecoef = C[2, 1] * 2.0

    theta = 0.5 * jnp.arctan2(b, a - c)
    den = 4.0 * a * c - b * b
    x_c = (b * ecoef - 2.0 * c * d) / den
    y_c = (b * d - 2.0 * a * ecoef) / den

    quad = a * x_c * x_c + c * y_c * y_c + b * x_c * y_c - 1.0
    root = jnp.sqrt((a - c) * (a - c) + b * b)
    a2 = 2.0 * quad / (a + c + root)
    b2 = 2.0 * quad / (a + c - root)
    axis1 = jnp.sqrt(jnp.maximum(a2, 0.0))
    axis2 = jnp.sqrt(jnp.maximum(b2, 0.0))
    return jnp.stack([x_c, y_c, theta, axis1, axis2])


def ellipse_to_bbox(ellipse: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned bbox [x1,y1,x2,y2] of an ellipse (Ellipsoid.cpp:252-273)."""
    a, b, theta = ellipse[3], ellipse[4], ellipse[2]
    x, y = ellipse[0], ellipse[1]
    c2 = jnp.cos(theta) ** 2
    s2 = 1.0 - c2
    x_limit = jnp.sqrt(a * a * c2 + b * b * s2)
    y_limit = jnp.sqrt(a * a * s2 + b * b * c2)
    return jnp.stack([x - x_limit, y - y_limit, x + x_limit, y + y_limit])


def project_bbox(e: jnp.ndarray, pose_cw: jnp.ndarray,
                 K: jnp.ndarray) -> jnp.ndarray:
    """Projected bounding box via the conic (Ellipsoid.cpp:303-307)."""
    return ellipse_to_bbox(project_ellipse(e, pose_cw, K))


def project_bbox_dual(e: jnp.ndarray, pose_cw: jnp.ndarray,
                      K: jnp.ndarray) -> jnp.ndarray:
    """Projected bbox straight from the dual conic (no ellipse-angle step).

    The tangent vertical/horizontal lines l of the ellipse satisfy
    l^T C* l = 0, giving closed-form extrema
    x = (C*02 +- sqrt(C*02^2 - C*00 C*22)) / C*22 (and likewise for y) --
    exactly the same bbox as the reference's ellipse-parameter route for
    valid ellipses, but transcendental-free (atan2 has no Mosaic lowering,
    so the pallas BA kernels use this path).
    """
    C = _conic_cstar(e, pose_cw, K)
    dx = jnp.sqrt(jnp.maximum(C[0, 2] * C[0, 2] - C[0, 0] * C[2, 2], 0.0))
    dy = jnp.sqrt(jnp.maximum(C[1, 2] * C[1, 2] - C[1, 1] * C[2, 2], 0.0))
    xa = (C[0, 2] - dx) / C[2, 2]
    xb = (C[0, 2] + dx) / C[2, 2]
    ya = (C[1, 2] - dy) / C[2, 2]
    yb = (C[1, 2] + dy) / C[2, 2]
    return jnp.stack([jnp.minimum(xa, xb), jnp.minimum(ya, yb),
                      jnp.maximum(xa, xb), jnp.maximum(ya, yb)])


# host-side constant (numpy, NOT jnp: a module-level device array would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize in multi-process runs)
import numpy as _np
_CUBE_CORNERS = _np.array([
    [1, 1, -1, -1, 1, 1, -1, -1],
    [1, -1, -1, 1, 1, -1, -1, 1],
    [-1, -1, -1, -1, 1, 1, 1, 1],
], dtype=_np.float32)  # Ellipsoid.cpp:475-477


def cube_corners(e: jnp.ndarray) -> jnp.ndarray:
    """World coords of the circumscribed cube's 8 corners, 3x8
    (Ellipsoid.cpp:472-480)."""
    R = se3.quat_to_mat(e[3:7])
    S = jnp.diag(scale_of(e))
    return (R @ S) @ _CUBE_CORNERS + e[:3, None]


def project_cube_bbox(e: jnp.ndarray, pose_cw: jnp.ndarray,
                      K: jnp.ndarray) -> jnp.ndarray:
    """Bbox [x1,y1,x2,y2] of the projected cube corners (Ellipsoid.cpp:482-497)."""
    P = projection_matrix(pose_cw, K)
    corners = cube_corners(e)  # 3x8
    homo = jnp.concatenate([corners, jnp.ones((1, 8), dtype=e.dtype)], axis=0)
    uv = P @ homo
    uv = uv[:2] / uv[2:3]
    mins = jnp.min(uv, axis=1)
    maxs = jnp.max(uv, axis=1)
    return jnp.concatenate([mins, maxs])


def project_cube_bbox_cwh(e: jnp.ndarray, pose_cw: jnp.ndarray,
                          K: jnp.ndarray) -> jnp.ndarray:
    """Projected cube bbox as [center_x, center_y, width, height]
    (projectOntoImageBbox, Ellipsoid.cpp:500-506)."""
    r = project_cube_bbox(e, pose_cw, K)
    center = (r[2:] + r[:2]) / 2.0
    wh = r[2:] - r[:2]
    return jnp.concatenate([center, wh])


def is_observable(e: jnp.ndarray, pose_cw: jnp.ndarray) -> jnp.ndarray:
    """Center-in-front-of-camera check (Ellipsoid.cpp:328-343)."""
    pc = se3.se3_apply(pose_cw, e[:3])
    return pc[2] >= 0
