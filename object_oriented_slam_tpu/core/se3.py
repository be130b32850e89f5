"""SE(3) / quaternion operations as pure JAX functions.

TPU-native replacement for the reference's ``g2o::SE3Quat``
(``/root/reference/Thirdparty/g2o/g2o/types/se3quat.h``).  Everything here is a
pure function over small jnp arrays so it can be freely ``vmap``-ed over
frames / objects / observations and traced once under ``jit``.

Conventions (matching the reference exactly):
  * quaternion ``q`` is a ``(4,)`` array ``[qx, qy, qz, qw]`` (TUM file order,
    g2o ``SE3Quat::toVector`` order, se3quat.h:60-76).
  * a rigid transform ("pose7") is a ``(7,)`` array ``[tx,ty,tz,qx,qy,qz,qw]``.
  * ``se3_exp`` takes a ``(6,)`` tangent ``[omega(3), upsilon(3)]`` -- rotation
    first, exactly like ``SE3Quat::exp`` (se3quat.h:249-287).
  * euler conversions use the ZYX (roll-pitch-yaw) convention of
    ``src/utils/matrix_utils.cpp:41-118`` and se3quat.h:184-226.

All math is float32; host-side IO keeps float64 and casts at the boundary.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _mv(M, v):
    """3x3 @ 3 matvec as elementwise ops (1-D dot_general does not lower
    inside Mosaic/pallas kernels)."""
    return jnp.sum(M * v[None, :], axis=1)


# --- atan2 indirection: Mosaic has no atan2 primitive, so pallas kernels
# --- swap in a float32-accurate polynomial (ops/pallas/compat.py) at trace
# --- time via this hook; everything else uses the exact jnp.arctan2.
_ATAN2 = [jnp.arctan2]


def atan2(y, x):
    return _ATAN2[0](y, x)


def _mm3(A, B):
    """3x3 matmul as unrolled elementwise ops (batched tpu.matmul of tiny
    operands has no Mosaic lowering)."""
    rows = []
    for i in range(3):
        cols = []
        for j in range(3):
            cols.append(A[..., i, 0] * B[..., 0, j]
                        + A[..., i, 1] * B[..., 1, j]
                        + A[..., i, 2] * B[..., 2, j])
        rows.append(jnp.stack(cols, axis=-1))
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# Quaternion primitives
# ---------------------------------------------------------------------------

def quat_identity() -> jnp.ndarray:
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float32)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(jnp.linalg.norm(q), _EPS)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product; both quats are [x, y, z, w]."""
    x1, y1, z1, w1 = q1[0], q1[1], q1[2], q1[3]
    x2, y2, z2, w2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    # stack of traced scalars (a literal const array would be captured as a
    # closure constant inside pallas kernels, which is rejected)
    return jnp.stack([-q[0], -q[1], -q[2], q[3]])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by unit quaternion q (R(q) @ v)."""
    qv = q[:3]
    w = q[3]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.array([
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ])


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion [x,y,z,w] (branchless Shepperd).

    Computes all four branch candidates and selects the numerically best one
    with ``where`` so the function stays trace- and vmap-friendly.
    """
    m00, m01, m02 = m[0, 0], m[0, 1], m[0, 2]
    m10, m11, m12 = m[1, 0], m[1, 1], m[1, 2]
    m20, m21, m22 = m[2, 0], m[2, 1], m[2, 2]

    tr = m00 + m11 + m22
    # candidate 0: trace branch
    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr])
    # candidate 1: x branch
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12])
    # candidate 2: y branch
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20])
    # candidate 3: z branch
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01])

    cands = jnp.stack([q0, q1, q2, q3])  # [4, 4]
    # pick the branch with the largest pivot (max |w|-ish component)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22])
    idx = jnp.argmax(pivots)
    q = cands[idx]
    q = q / jnp.maximum(jnp.linalg.norm(q), _EPS)
    # canonical sign: w >= 0
    return jnp.where(q[3] < 0, -q, q)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.array([
        [0.0, -v[2], v[1]],
        [v[2], 0.0, -v[0]],
        [-v[1], v[0], 0.0],
    ])


# ---------------------------------------------------------------------------
# SO(3) exp / log
# ---------------------------------------------------------------------------

def so3_exp_quat(omega: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> quaternion [x,y,z,w], small-angle safe."""
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    # sin(half)/theta with Taylor fallback
    k = jnp.where(theta2 > 1e-10, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    return jnp.concatenate([omega * k, jnp.cos(half)[None]])


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [x,y,z,w] -> axis-angle (3,)."""
    qv = q[:3]
    w = q[3]
    # force positive hemisphere
    sgn = jnp.where(w < 0, -1.0, 1.0)
    qv = qv * sgn
    w = w * sgn
    n = jnp.linalg.norm(qv)
    theta = 2.0 * atan2(n, w)
    k = jnp.where(n > 1e-7, theta / jnp.maximum(n, _EPS), 2.0 / jnp.maximum(w, _EPS))
    return qv * k


# ---------------------------------------------------------------------------
# SE(3) on pose7 = [t(3), q(4)]
# ---------------------------------------------------------------------------

def se3_identity() -> jnp.ndarray:
    return jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=jnp.float32)


def se3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: (a*b) x = a(b(x))."""
    t = a[:3] + quat_rotate(a[3:], b[:3])
    q = quat_normalize(quat_mul(a[3:], b[3:]))
    return jnp.concatenate([t, q])


def se3_inv(a: jnp.ndarray) -> jnp.ndarray:
    qi = quat_conj(a[3:])
    return jnp.concatenate([-quat_rotate(qi, a[:3]), qi])


def se3_apply(a: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Apply transform to point(s); p is (3,) or (..., 3)."""
    if p.ndim == 1:
        return quat_rotate(a[3:], p) + a[:3]
    R = quat_to_mat(a[3:])
    return p @ R.T + a[:3]


def se3_to_mat(a: jnp.ndarray) -> jnp.ndarray:
    """pose7 -> 4x4 homogeneous matrix (se3quat.h to_homogeneous_matrix)."""
    R = quat_to_mat(a[3:])
    top = jnp.concatenate([R, a[:3, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def mat_to_se3(m: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([m[:3, 3], mat_to_quat(m[:3, :3])])


def _so3_left_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """V matrix of SE(3) exp: t = V @ upsilon (se3quat.h:249-287)."""
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    Om = skew(omega)
    Om2 = _mm3(Om, Om)
    a = jnp.where(theta2 > 1e-10, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS),
                  0.5 - theta2 / 24.0)
    b = jnp.where(theta2 > 1e-10,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
                  1.0 / 6.0 - theta2 / 120.0)
    return jnp.eye(3, dtype=omega.dtype) + a * Om + b * Om2


def se3_exp(u: jnp.ndarray) -> jnp.ndarray:
    """Tangent (6,) [omega, upsilon] -> pose7, matching SE3Quat::exp."""
    omega = u[:3]
    upsilon = u[3:6]
    q = so3_exp_quat(omega)
    V = _so3_left_jacobian(omega)
    return jnp.concatenate([_mv(V, upsilon), q])


def _so3_left_jacobian_inv(omega: jnp.ndarray) -> jnp.ndarray:
    """Closed-form V^-1 = I - 1/2 [w]x + c [w]x^2 with
    c = (1 - (theta/2) cot(theta/2)) / theta^2.

    Avoids the LU solve of jnp.linalg.solve, which serializes on TPU when
    vmapped over every 3D edge of the BA graph.
    """
    theta2 = jnp.sum(omega * omega)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    Om = skew(omega)
    Om2 = _mm3(Om, Om)
    half = 0.5 * theta
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    c = jnp.where(theta2 > 1e-10,
                  (1.0 - cot_term) / jnp.maximum(theta2, _EPS),
                  1.0 / 12.0 + theta2 / 720.0)
    return jnp.eye(3, dtype=omega.dtype) - 0.5 * Om + c * Om2


def se3_log(a: jnp.ndarray) -> jnp.ndarray:
    """pose7 -> tangent (6,) [omega, upsilon], inverse of se3_exp."""
    omega = so3_log(a[3:])
    upsilon = _mv(_so3_left_jacobian_inv(omega), a[:3])
    return jnp.concatenate([omega, upsilon])


# ---------------------------------------------------------------------------
# Euler conversions (ZYX), matching src/utils/matrix_utils.cpp:41-118
# ---------------------------------------------------------------------------

def zyx_euler_to_quat(roll: jnp.ndarray, pitch: jnp.ndarray,
                      yaw: jnp.ndarray) -> jnp.ndarray:
    """matrix_utils.cpp:41-54; returns [x,y,z,w]."""
    sy, cy = jnp.sin(yaw * 0.5), jnp.cos(yaw * 0.5)
    sp, cp = jnp.sin(pitch * 0.5), jnp.cos(pitch * 0.5)
    sr, cr = jnp.sin(roll * 0.5), jnp.cos(roll * 0.5)
    return jnp.stack([
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
        cr * cp * cy + sr * sp * sy,
    ])


def quat_to_euler_zyx(q: jnp.ndarray) -> jnp.ndarray:
    """matrix_utils.cpp:60-70; returns [roll, pitch, yaw]."""
    qx, qy, qz, qw = q[0], q[1], q[2], q[3]
    roll = jnp.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx * qx + qy * qy))
    pitch = jnp.arcsin(jnp.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
    return jnp.stack([roll, pitch, yaw])


def rot_to_euler_zyx(R: jnp.ndarray) -> jnp.ndarray:
    """matrix_utils.cpp:76-95 (non-degenerate branch; degeneracy clamped)."""
    pitch = jnp.arcsin(jnp.clip(-R[2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    return jnp.stack([roll, pitch, yaw])


def euler_zyx_to_rot(roll: jnp.ndarray, pitch: jnp.ndarray,
                     yaw: jnp.ndarray) -> jnp.ndarray:
    """matrix_utils.cpp:102-116."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    sr, cr = jnp.sin(roll), jnp.cos(roll)
    sy, cy = jnp.sin(yaw), jnp.cos(yaw)
    return jnp.array([
        [cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy],
        [cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy],
        [-sp, sr * cp, cr * cp],
    ])


def pose7_to_xyzrpy(a: jnp.ndarray) -> jnp.ndarray:
    """pose7 -> [x,y,z,roll,pitch,yaw] (se3quat.h toXYZPRYVector)."""
    return jnp.concatenate([a[:3], quat_to_euler_zyx(a[3:])])


def xyzrpy_to_pose7(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v[:3], zyx_euler_to_quat(v[3], v[4], v[5])])
