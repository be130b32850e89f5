"""Structure-of-arrays (SoA) batched LM backend — the TPU-layout fast path.

Same factor-graph semantics as ``backend/lm.py`` (the faithful
array-of-structs implementation of ``/root/reference/src/core/
Optimizer.cpp:83-317``), re-laid-out for the TPU memory system:

The AoS path vmaps per-observation functions, so every intermediate of the
conic-projection chain is shaped ``[O, M, 3, 3]``-ish — the *trailing* dims
are tiny (3, 4, 7, 9) and the TPU pads the last two logical dims to (8, 128)
tiles, inflating each fusion boundary ~40x (a [24,512,3,3] f32 tensor
occupies 24*512*8*128*4 = 50 MB of tiled HBM instead of 1.2 MB).  Here every
quantity is a tuple of scalar-arrays shaped ``[O, M]`` (objects in sublanes,
observations in lanes), so the whole residual/jacobian evaluation is one
dense elementwise pipeline at native tile occupancy, and the only matmuls
are the final ``J^T J`` contractions over the long observation axis (MXU).

Numerical notes: the arithmetic mirrors the AoS expressions term-for-term
(same formulas, same operand order), but reduction orders differ (H/g are
assembled by einsum over a differently-ordered flat residual), so results
match the AoS backend to f32 round-off (~1e-6 relative), not bit-exactly —
the same class of drift the observation-capacity tiers already introduce.

Semantics replicated from the reference (see backend/lm.py for citations):
2D-edge >2-obs gate, info = I4·prob, NaN-edge drop at the initial estimate,
3D edges info = I9·prob·Scale, gravity prior, 10-iteration g2o LM lambda
schedule, right-multiplicative SE3⊕scale vertex update.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..ops.linalg import chol_solve_small
from .lm import LMConfig, ObjectObservations

_EPS = 1e-8
_TAU = 1e-5


# ---------------------------------------------------------------------------
# Componentwise (tuple-of-arrays) quaternion / SE3 helpers.
# Each mirrors the corresponding core/se3.py function term-for-term.
# ---------------------------------------------------------------------------

def _qmul(q1, q2):
    x1, y1, z1, w1 = q1
    x2, y2, z2, w2 = q2
    return (w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2)


def _qnormalize(q):
    x, y, z, w = q
    n = jnp.sqrt(x * x + y * y + z * z + w * w)
    n = jnp.maximum(n, _EPS)
    return (x / n, y / n, z / n, w / n)


def _cross(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _qrotate(q, v):
    """R(q) @ v, componentwise (se3.quat_rotate)."""
    qv = (q[0], q[1], q[2])
    w = q[3]
    tx, ty, tz = _cross(qv, v)
    t = (2.0 * tx, 2.0 * ty, 2.0 * tz)
    c = _cross(qv, t)
    return (v[0] + w * t[0] + c[0],
            v[1] + w * t[1] + c[1],
            v[2] + w * t[2] + c[2])


def _qconj(q):
    return (-q[0], -q[1], -q[2], q[3])


def _qtomat(q):
    """Rotation-matrix entries r[i][j] as a 3x3 nested tuple."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


def _se3_mul(a, b):
    """Compose pose7 tuples a*b; a = (t3tuple, q4tuple)."""
    ta, qa = a
    tb, qb = b
    r = _qrotate(qa, tb)
    t = (ta[0] + r[0], ta[1] + r[1], ta[2] + r[2])
    q = _qnormalize(_qmul(qa, qb))
    return (t, q)


def _se3_inv(a):
    t, q = a
    qi = _qconj(q)
    r = _qrotate(qi, t)
    return ((-r[0], -r[1], -r[2]), qi)


def _so3_exp_quat(omega):
    ox, oy, oz = omega
    theta2 = ox * ox + oy * oy + oz * oz
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    k = jnp.where(theta2 > 1e-10, jnp.sin(half) / theta, 0.5 - theta2 / 48.0)
    return (ox * k, oy * k, oz * k, jnp.cos(half))


def _so3_log(q):
    x, y, z, w = q
    sgn = jnp.where(w < 0, -1.0, 1.0)
    x, y, z, w = x * sgn, y * sgn, z * sgn, w * sgn
    n = jnp.sqrt(x * x + y * y + z * z)
    theta = 2.0 * jnp.arctan2(n, w)
    k = jnp.where(n > 1e-7, theta / jnp.maximum(n, _EPS),
                  2.0 / jnp.maximum(w, _EPS))
    return (x * k, y * k, z * k)


def _vinv_apply(omega, t):
    """(V^-1 of SE3 log) @ t, componentwise (se3._so3_left_jacobian_inv)."""
    ox, oy, oz = omega
    theta2 = ox * ox + oy * oy + oz * oz
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    half = 0.5 * theta
    cot_term = half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)
    c = jnp.where(theta2 > 1e-10, (1.0 - cot_term) / jnp.maximum(theta2, _EPS),
                  1.0 / 12.0 + theta2 / 720.0)
    # Om = skew(omega); V^-1 = I - 0.5 Om + c Om^2
    # Om2 entries:
    o00 = -(oz * oz + oy * oy)
    o01 = oy * ox
    o02 = oz * ox
    o11 = -(oz * oz + ox * ox)
    o12 = oz * oy
    o22 = -(oy * oy + ox * ox)
    v00, v01, v02 = 1.0 + c * o00, 0.5 * oz + c * o01, -0.5 * oy + c * o02
    v10, v11, v12 = -0.5 * oz + c * o01, 1.0 + c * o11, 0.5 * ox + c * o12
    v20, v21, v22 = 0.5 * oy + c * o02, -0.5 * ox + c * o12, 1.0 + c * o22
    tx, ty, tz = t
    return (v00 * tx + v01 * ty + v02 * tz,
            v10 * tx + v11 * ty + v12 * tz,
            v20 * tx + v21 * ty + v22 * tz)


def _se3_log(a):
    t, q = a
    omega = _so3_log(q)
    ups = _vinv_apply(omega, t)
    return omega + ups  # 6-tuple


def _se3_exp(u6):
    """Tangent 6-tuple [omega, upsilon] -> pose tuple (se3.se3_exp)."""
    omega = u6[:3]
    ups = u6[3:]
    q = _so3_exp_quat(omega)
    # V = I + a Om + b Om^2
    ox, oy, oz = omega
    theta2 = ox * ox + oy * oy + oz * oz
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    a = jnp.where(theta2 > 1e-10,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS),
                  0.5 - theta2 / 24.0)
    b = jnp.where(theta2 > 1e-10,
                  (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS),
                  1.0 / 6.0 - theta2 / 120.0)
    o00 = -(oz * oz + oy * oy)
    o01 = oy * ox
    o02 = oz * ox
    o11 = -(oz * oz + ox * ox)
    o12 = oz * oy
    o22 = -(oy * oy + ox * ox)
    v00, v01, v02 = 1.0 + b * o00, -a * oz + b * o01, a * oy + b * o02
    v10, v11, v12 = a * oz + b * o01, 1.0 + b * o11, -a * ox + b * o12
    v20, v21, v22 = -a * oy + b * o02, a * ox + b * o12, 1.0 + b * o22
    ux, uy, uz = ups
    t = (v00 * ux + v01 * uy + v02 * uz,
         v10 * ux + v11 * uy + v12 * uz,
         v20 * ux + v21 * uy + v22 * uz)
    return (t, q)


def _exp_update(est10, u9):
    """Ellipsoid oplus (core/ellipsoid.exp_update): pose*exp(u[:6]), s+u[6:].

    est10: 10-tuple of [O]-arrays; u9: 9-tuple of [O]-arrays.
    """
    pose = ((est10[0], est10[1], est10[2]),
            (est10[3], est10[4], est10[5], est10[6]))
    d = _se3_exp(u9[:6])
    t, q = _se3_mul(pose, d)
    return (t[0], t[1], t[2], q[0], q[1], q[2], q[3],
            est10[7] + u9[6], est10[8] + u9[7], est10[9] + u9[8])


# ---------------------------------------------------------------------------
# Residual chains (componentwise over [O, M] observation grids)
# ---------------------------------------------------------------------------

def _proj_bbox_soa(e, tcw, qcw, fx, fy, cx, cy):
    """Projected ellipse bbox; 4-tuple (x1,y1,x2,y2) of [O, M2] arrays.

    Mirrors core/ellipsoid.project_ellipse + ellipse_to_bbox
    (Ellipsoid.cpp:209-273 formulas), with every 3x3 product unrolled
    over the [O, M2] grid.  ``e`` is the per-object estimate as a
    10-tuple of [O, 1] arrays.
    """
    # R_cw per obs, R/scale/t per object (broadcast [O,1] over [O,M2])
    Rcw = _qtomat((qcw[0], qcw[1], qcw[2], qcw[3]))
    Robj = _qtomat((e[3], e[4], e[5], e[6]))
    s = (e[7], e[8], e[9])
    t = (e[0], e[1], e[2])

    # A = K @ R_cw with K = [[fx,0,cx],[0,fy,cy],[0,0,1]]
    A = ((fx * Rcw[0][0] + cx * Rcw[2][0],
          fx * Rcw[0][1] + cx * Rcw[2][1],
          fx * Rcw[0][2] + cx * Rcw[2][2]),
         (fy * Rcw[1][0] + cy * Rcw[2][0],
          fy * Rcw[1][1] + cy * Rcw[2][1],
          fy * Rcw[1][2] + cy * Rcw[2][2]),
         (Rcw[2][0], Rcw[2][1], Rcw[2][2]))

    # W = A @ R_obj ; WS = W * diag(s)
    WS = tuple(
        tuple((A[i][0] * Robj[0][j] + A[i][1] * Robj[1][j]
               + A[i][2] * Robj[2][j]) * s[j] for j in range(3))
        for i in range(3))
    # v = A @ t_obj + K @ t_cw
    kt = (fx * tcw[0] + cx * tcw[2], fy * tcw[1] + cy * tcw[2], tcw[2])
    v = tuple(A[i][0] * t[0] + A[i][1] * t[1] + A[i][2] * t[2] + kt[i]
              for i in range(3))

    # C* = WS WS^T - v v^T (symmetric; 6 unique entries)
    def cs(i, j):
        return (WS[i][0] * WS[j][0] + WS[i][1] * WS[j][1]
                + WS[i][2] * WS[j][2]) - v[i] * v[j]

    a_, b_, c_ = cs(0, 0), cs(0, 1), cs(0, 2)
    e_, f_ = cs(1, 1), cs(1, 2)
    i_ = cs(2, 2)

    # C = inv3(C*) (ops/linalg.inv3 adjugate form, symmetric operands),
    # then normalized by C[2,2] — exactly project_ellipse's two divisions
    adjA = e_ * i_ - f_ * f_
    adjD = -(b_ * i_ - c_ * f_)
    adjE = a_ * i_ - c_ * c_
    adjG = b_ * f_ - c_ * e_
    adjH = -(a_ * f_ - c_ * b_)
    adjI = a_ * e_ - b_ * b_
    det = a_ * adjA + b_ * (-(b_ * i_ - f_ * c_)) + c_ * (b_ * f_ - e_ * c_)
    det = det + jnp.where(det == 0, 1e-30, 0.0)
    c00 = adjA / det
    c01 = adjD / det
    c11 = adjE / det
    c02 = adjG / det
    c21 = adjH / det
    c22 = adjI / det
    # normalize by C[2,2]
    ca = c00 / c22
    cb = (c01 / c22) * 2.0
    cc = c11 / c22
    cd = (c02 / c22) * 2.0
    ce = (c21 / c22) * 2.0

    theta = 0.5 * jnp.arctan2(cb, ca - cc)
    den = 4.0 * ca * cc - cb * cb
    x_c = (cb * ce - 2.0 * cc * cd) / den
    y_c = (cb * cd - 2.0 * ca * ce) / den
    quad = ca * x_c * x_c + cc * y_c * y_c + cb * x_c * y_c - 1.0
    root = jnp.sqrt((ca - cc) * (ca - cc) + cb * cb)
    a2 = 2.0 * quad / (ca + cc + root)
    b2 = 2.0 * quad / (ca + cc - root)
    ax1 = jnp.sqrt(jnp.maximum(a2, 0.0))
    ax2 = jnp.sqrt(jnp.maximum(b2, 0.0))
    c2t = jnp.cos(theta) ** 2
    s2t = 1.0 - c2t
    x_lim = jnp.sqrt(ax1 * ax1 * c2t + ax2 * ax2 * s2t)
    y_lim = jnp.sqrt(ax1 * ax1 * s2t + ax2 * ax2 * c2t)
    return (x_c - x_lim, y_c - y_lim, x_c + x_lim, y_c + y_lim)


def _proj_residual_soa(e, tcw, qcw, bbox, fx, fy, cx, cy):
    """2D conic-projection residual; 4-tuple of [O, M2] arrays.

    residuals.residual_proj semantics: border coords (< 5) are skipped
    (BasicEllipsoidEdges.cpp:102-112).
    """
    proj = _proj_bbox_soa(e, tcw, qcw, fx, fy, cx, cy)
    return tuple(jnp.where(bbox[k] >= 5.0, proj[k] - bbox[k], 0.0)
                 for k in range(4))


def soa_visibility2d(est0, tcw, qcw, K, rows, cols):
    """[O,M2] visibility mask of 2D edges at the initial estimate.

    Replicates the optional ``checkVisibility`` edge gate the reference
    keeps disabled (/root/reference/src/core/Optimizer.cpp:35-81,232):
    an edge is dropped when (1) the object center is behind the camera,
    (2) the camera center lies inside the quadric (ill-conditioned
    projection), or (3) neither the projected center nor either corner
    of the projected bbox lies strictly inside the image
    (isInImage, Optimizer.cpp:20-27: 0 < u < cols and 0 < v < rows).
    Like the reference, the test runs once at graph-build time against
    the initial estimates.
    """
    e0 = tuple(est0[:, k:k + 1] for k in range(10))
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    Rcw = _qtomat((qcw[0], qcw[1], qcw[2], qcw[3]))

    # object center in the camera frame: Pc = Rcw @ Pw + tcw
    pc = tuple(Rcw[i][0] * e0[0] + Rcw[i][1] * e0[1] + Rcw[i][2] * e0[2]
               + tcw[i] for i in range(3))
    in_front = pc[2] >= 0.0                       # Optimizer.cpp:49-52

    # camera center in world: Xw = -Rcw^T tcw; inside test in the
    # ellipsoid frame: sum((Robj^T (Xw - t_obj) / s)^2) < 1 equals
    # X^T Q X < 0 of Optimizer.cpp:55-62
    xw = tuple(-(Rcw[0][i] * tcw[0] + Rcw[1][i] * tcw[1]
                 + Rcw[2][i] * tcw[2]) for i in range(3))
    Robj = _qtomat((e0[3], e0[4], e0[5], e0[6]))
    d = (xw[0] - e0[0], xw[1] - e0[1], xw[2] - e0[2])
    lo = tuple(Robj[0][i] * d[0] + Robj[1][i] * d[1] + Robj[2][i] * d[2]
               for i in range(3))
    q_val = sum((lo[i] / jnp.maximum(jnp.abs(e0[7 + i]), 1e-8)) ** 2
                for i in range(3))
    outside = q_val >= 1.0

    # projected center (Optimizer.cpp:64-70)
    zden = jnp.where(jnp.abs(pc[2]) > 1e-8, pc[2], 1e-8)
    u = fx * pc[0] / zden + cx
    v = fy * pc[1] / zden + cy

    def in_img(x, y):
        return (x > 0) & (x < cols) & (y > 0) & (y < rows)

    center_in = in_img(u, v)

    # else: either projected-bbox corner in image (Optimizer.cpp:73-77)
    x1, y1, x2, y2 = _proj_bbox_soa(e0, tcw, qcw, fx, fy, cx, cy)
    corner_in = in_img(x1, y1) | in_img(x2, y2)

    return in_front & outside & (center_in | corner_in)


def _precompute_3d_soa(p3, me3):
    """SoA version of residuals.precompute_3d_measurement.

    p3: 7-tuple of [O,M3] (pose_wc), me3: 10-tuple of [O,M3].
    Returns per-rotation lists invp[k] (7-tuple) and sc[k] (3-tuple),
    k over the {-90, 0, 90, 180}-deg yaw candidates.
    """
    mw = _se3_mul(((p3[0], p3[1], p3[2]), (p3[3], p3[4], p3[5], p3[6])),
                  ((me3[0], me3[1], me3[2]),
                   (me3[3], me3[4], me3[5], me3[6])))
    sx, sy, sz = me3[7], me3[8], me3[9]
    zeros = jnp.zeros_like(sx)
    invp4, sc4 = [], []
    for k in (-1, 0, 1, 2):
        yaw = k * math.pi / 2.0
        s_h, c_h = math.sin(yaw * 0.5), math.cos(yaw * 0.5)
        rot = ((zeros, zeros, zeros), (zeros, zeros, zeros + s_h, zeros + c_h))
        t, q = _se3_inv(_se3_mul(mw, rot))
        invp4.append((t[0], t[1], t[2], q[0], q[1], q[2], q[3]))
        sc4.append((sy, sx, sz) if k % 2 != 0 else (sx, sy, sz))
    return invp4, sc4


def _res3d_soa(e, invp4, sc4):
    """3D 9-DoF residual with 4-rotation minimization; 9-tuple of [O,M3]."""
    errs = []
    norms = []
    for k in range(4):
        p = invp4[k]
        diff = _se3_mul(((p[0], p[1], p[2]), (p[3], p[4], p[5], p[6])),
                        ((e[0], e[1], e[2]), (e[3], e[4], e[5], e[6])))
        lg = _se3_log(diff)
        err = lg + (e[7] - sc4[k][0], e[8] - sc4[k][1], e[9] - sc4[k][2])
        errs.append(err)
        n = err[0] * err[0]
        for c in err[1:]:
            n = n + c * c
        norms.append(n)
    nmat = jnp.stack(norms)                       # [4, O, M3]
    idx = jax.lax.stop_gradient(jnp.argmin(nmat, axis=0))
    out = []
    for c in range(9):
        acc = jnp.where(idx == 0, errs[0][c], errs[1][c])
        acc = jnp.where(idx == 2, errs[2][c], acc)
        acc = jnp.where(idx == 3, errs[3][c], acc)
        out.append(acc)
    return tuple(out)


def _gravity_residual_soa(e, normal):
    """Gravity-prior residual, [O]-array (residuals.residual_gravity)."""
    R = _qtomat((e[3], e[4], e[5], e[6]))
    zx, zy, zz = R[0][2], R[1][2], R[2][2]
    nx, ny, nz = normal[0], normal[1], normal[2]
    dot = zx * nx + zy * ny + zz * nz
    zn = jnp.sqrt(zx * zx + zy * zy + zz * zz)
    nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    cosang = dot / (zn * jnp.maximum(nn, 1e-8))
    cosang = jnp.clip(cosang, -1.0 + 1e-4, 1.0 - 1e-4)
    return jnp.arccos(cosang)


def _huber_w(comps, delta):
    s = comps[0] * comps[0]
    for c in comps[1:]:
        s = s + c * c
    w = jnp.where(s > delta * delta,
                  jnp.sqrt(delta / jnp.maximum(jnp.sqrt(s), 1e-12)), 1.0)
    return jax.lax.stop_gradient(w)


def _finite0(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


# ---------------------------------------------------------------------------
# Reusable shard-local pieces (also used by parallel/dist_lm.py, where each
# device runs them over its observation shard and psums the H/g blocks)
# ---------------------------------------------------------------------------

def soa_prepare(pose2d_cw, bbox2d, pose3d_wc, meas3d):
    """Transpose observation buffers into SoA component tuples.

    Returns (tcw, qcw, b2, invp4, sc4) — everything estimate-independent,
    including the hoisted 3D-measurement rotations.
    """
    p2 = tuple(pose2d_cw[:, :, k] for k in range(7))
    b2 = tuple(bbox2d[:, :, k] for k in range(4))
    p3 = tuple(pose3d_wc[:, :, k] for k in range(7))
    me3 = tuple(meas3d[:, :, k] for k in range(10))
    tcw = (p2[0], p2[1], p2[2])
    qcw = (p2[3], p2[4], p2[5], p2[6])
    invp4, sc4 = _precompute_3d_soa(p3, me3)
    return tcw, qcw, b2, invp4, sc4


def soa_finite2d(est0, tcw, qcw, b2, K):
    """[O,M2] mask of 2D edges finite at the initial estimate."""
    e0c = tuple(est0[:, k:k + 1] for k in range(10))
    r2 = _proj_residual_soa(e0c, tcw, qcw, b2,
                            K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    fin = jnp.isfinite(r2[0])
    for c in r2[1:]:
        fin = fin & jnp.isfinite(c)
    return fin


def soa_residual_comps(est_flat, u_flat, prep, w2d, w3d, wg, ground_normal,
                       K, huber_delta=0.0):
    """All weighted residual components at exp_update(est, u).

    est_flat [O,10], u_flat [O,9] -> tuple of 14 arrays:
    4x[O,M2] + 9x[O,M3] + 1x[O].  Weights fold masks/probs/gates.
    """
    tcw, qcw, b2, invp4, sc4 = prep
    normal = (ground_normal[0], ground_normal[1], ground_normal[2])
    e10 = _exp_update(tuple(est_flat[:, k] for k in range(10)),
                      tuple(u_flat[:, k] for k in range(9)))
    eb = tuple(c[:, None] for c in e10)
    r2 = _proj_residual_soa(eb, tcw, qcw, b2,
                            K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    r2 = tuple(c * w2d for c in r2)
    r3 = _res3d_soa(eb, invp4, sc4)
    r3 = tuple(c * w3d for c in r3)
    if huber_delta > 0.0:
        h2 = _huber_w(r2, huber_delta)
        r2 = tuple(c * h2 for c in r2)
        h3 = _huber_w(r3, huber_delta)
        r3 = tuple(c * h3 for c in r3)
    rg = _gravity_residual_soa(tuple(c[:, 0] for c in eb), normal) * wg
    return tuple(_finite0(c) for c in (r2 + r3 + (rg,)))


def soa_flat_r(comps, O):
    """Concatenate residual components into [..., O, R]."""
    lead = comps[0].shape[:-2]
    parts = [c.reshape(lead + (O, -1)) for c in comps[:-1]]
    parts.append(comps[-1].reshape(lead + (O, 1)))
    return jnp.concatenate(parts, axis=-1)


def soa_normal_eq(est, prep, w2d, w3d, wg, ground_normal, K, huber_delta=0.0):
    """(H [O,9,9], g [O,9], r2sum [O]) from these observations.

    One linearize (primal + 9 tangent maps) followed by MXU contractions
    over the long flat-residual axis.
    """
    O = est.shape[0]
    f32 = est.dtype
    r_comps, lin = jax.linearize(
        lambda u: soa_residual_comps(est, u, prep, w2d, w3d, wg,
                                     ground_normal, K, huber_delta),
        jnp.zeros((O, 9), f32))
    basis = jnp.broadcast_to(jnp.eye(9, dtype=f32)[:, None, :], (9, O, 9))
    J = soa_flat_r(jax.vmap(lin)(basis), O)       # [9, O, R]
    r = soa_flat_r(r_comps, O)                    # [O, R]
    H = jnp.einsum("kor,lor->okl", J, J)
    g = jnp.einsum("kor,or->ok", J, r)
    return H, g, jnp.sum(r * r, axis=-1)


_CHUNK = 1024  # observation-lane chunk for the normal-equation build:
# measured on v5e, one [O, M] pass costs 6.5 ms at M2=2048 but 58.9 ms
# at 4096 and 269 ms at 8192 (superlinear — the [9, O, R] x [9, O, R]
# contraction with R ~ 70k lanes tiles badly).  Chunking the lanes and
# accumulating H/g keeps every pass in the good regime; production
# tiers (<= 512) never chunk, so the hot path is untouched.


def _slice_prep(prep, s2, e2, s3, e3):
    tcw, qcw, b2, invp4, sc4 = prep
    return (tuple(c[:, s2:e2] for c in tcw),
            tuple(c[:, s2:e2] for c in qcw),
            tuple(c[:, s2:e2] for c in b2),
            [tuple(c[:, s3:e3] for c in p) for p in invp4],
            [tuple(c[:, s3:e3] for c in p) for p in sc4])


def soa_normal_eq_chunked(est, prep, w2d, w3d, wg, ground_normal, K,
                          huber_delta=0.0, chunk=_CHUNK):
    """soa_normal_eq with the observation lanes processed in chunks.

    Bitwise-equal H/g up to f32 summation order; the gravity edge rides
    the first chunk only.
    """
    O = est.shape[0]
    M2, M3 = w2d.shape[1], w3d.shape[1]
    if M2 <= chunk and M3 <= chunk:
        return soa_normal_eq(est, prep, w2d, w3d, wg, ground_normal, K,
                             huber_delta)
    f32 = est.dtype
    H = jnp.zeros((O, 9, 9), f32)
    g = jnp.zeros((O, 9), f32)
    rs = jnp.zeros((O,), f32)
    zero_g = jnp.zeros_like(wg)
    n_chunks = max((M2 + chunk - 1) // chunk, (M3 + chunk - 1) // chunk)
    for ci in range(n_chunks):
        s2, e2 = min(ci * chunk, M2), min((ci + 1) * chunk, M2)
        s3, e3 = min(ci * chunk, M3), min((ci + 1) * chunk, M3)
        Hc, gc, rc = soa_normal_eq(
            est, _slice_prep(prep, s2, e2, s3, e3), w2d[:, s2:e2],
            w3d[:, s3:e3], wg if ci == 0 else zero_g, ground_normal, K,
            huber_delta)
        H, g, rs = H + Hc, g + gc, rs + rc
    return H, g, rs


def soa_chi2_chunked(est, prep, w2d, w3d, wg, ground_normal, K,
                     huber_delta=0.0, chunk=_CHUNK):
    O = est.shape[0]
    M2, M3 = w2d.shape[1], w3d.shape[1]
    if M2 <= chunk and M3 <= chunk:
        return soa_chi2(est, prep, w2d, w3d, wg, ground_normal, K,
                        huber_delta)
    f32 = est.dtype
    rs = jnp.zeros((O,), f32)
    zero_g = jnp.zeros_like(wg)
    n_chunks = max((M2 + chunk - 1) // chunk, (M3 + chunk - 1) // chunk)
    for ci in range(n_chunks):
        s2, e2 = min(ci * chunk, M2), min((ci + 1) * chunk, M2)
        s3, e3 = min(ci * chunk, M3), min((ci + 1) * chunk, M3)
        rs = rs + soa_chi2(
            est, _slice_prep(prep, s2, e2, s3, e3), w2d[:, s2:e2],
            w3d[:, s3:e3], wg if ci == 0 else zero_g, ground_normal, K,
            huber_delta)
    return rs


def soa_chi2(est, prep, w2d, w3d, wg, ground_normal, K, huber_delta=0.0):
    O = est.shape[0]
    r = soa_flat_r(soa_residual_comps(
        est, jnp.zeros((O, 9), est.dtype), prep, w2d, w3d, wg,
        ground_normal, K, huber_delta), O)
    return jnp.sum(r * r, axis=-1)


def soa_exp_update_flat(est, du):
    """Batched ellipsoid oplus on [O,10] / [O,9] arrays."""
    return jnp.stack(
        _exp_update(tuple(est[:, k] for k in range(10)),
                    tuple(du[:, k] for k in range(9))), axis=-1)


# ---------------------------------------------------------------------------
# The solver
# ---------------------------------------------------------------------------

def optimize_objects_soa(obs: ObjectObservations, K: jnp.ndarray,
                         ground_normal: jnp.ndarray, ground_set,
                         cfg: LMConfig = LMConfig()):
    """Drop-in equivalent of backend.lm.optimize_objects (SoA layout).

    Returns (estimates [O,10], chi2 [O]).  See module docstring for the
    layout rationale and the (f32 round-off level) numeric caveat.
    """
    O = obs.mask2d.shape[0]
    f32 = obs.est0.dtype

    prep = soa_prepare(obs.pose2d_cw, obs.bbox2d, obs.pose3d_wc, obs.meas3d)

    gravity_active = jnp.logical_and(jnp.asarray(ground_set),
                                     jnp.asarray(cfg.gravity_on))

    # ---- edge weights (sqrt info) with gating --------------------------
    n2d = jnp.sum(obs.mask2d, axis=1)
    gate2d = (n2d >= cfg.min_2d_obs)[:, None]
    w2d = jnp.sqrt(jnp.maximum(obs.prob2d, 0.0))
    w2d = jnp.where(obs.mask2d & gate2d, w2d, 0.0)
    w3d = jnp.sqrt(jnp.maximum(obs.prob3d, 0.0) * cfg.scale_3d)
    w3d = jnp.where(obs.mask3d, w3d, 0.0)
    wg = jnp.where(gravity_active, jnp.float32(cfg.gravity_scale), 0.0)
    wg = jnp.broadcast_to(wg, (O,)).astype(f32)

    # NaN gate at the initial estimate (Optimizer.cpp:234-243)
    w2d = jnp.where(soa_finite2d(obs.est0, prep[0], prep[1], prep[2], K),
                    w2d, 0.0)
    # optional visibility gate (Optimizer.cpp:35-81, off by default)
    if cfg.check_visibility:
        w2d = jnp.where(soa_visibility2d(obs.est0, prep[0], prep[1], K,
                                         cfg.vis_rows, cfg.vis_cols),
                        w2d, 0.0)

    hd = cfg.huber_delta
    eye9 = jnp.eye(9, dtype=f32)

    def step(carry, _):
        est, lam, nu, chi2 = carry
        H, g, _ = soa_normal_eq_chunked(est, prep, w2d, w3d, wg,
                                        ground_normal, K, hd)
        lam0 = jnp.where(lam < 0, _TAU * jnp.max(
            jnp.diagonal(H, axis1=1, axis2=2), axis=1), lam)
        lam0 = jnp.maximum(lam0, 1e-12)
        A = H + lam0[:, None, None] * eye9
        du = -chol_solve_small(A, g)              # [O, 9]
        du_ok = jnp.all(jnp.isfinite(du), axis=1, keepdims=True)
        du = jnp.where(du_ok, du, 0.0)

        est_new = soa_exp_update_flat(est, du)
        chi2_new = soa_chi2_chunked(est_new, prep, w2d, w3d, wg,
                                    ground_normal, K, hd)
        denom = jnp.sum(du * (lam0[:, None] * du - g), axis=1)
        rho = (chi2 - chi2_new) / jnp.where(jnp.abs(denom) > 1e-20,
                                            denom, 1e-20)
        accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
        factor = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, 2.0 / 3.0)
        lam_next = jnp.where(accept, lam0 * factor, lam0 * nu)
        nu_next = jnp.where(accept, 2.0, nu * 2.0)
        est_next = jnp.where(accept[:, None], est_new, est)
        chi2_next = jnp.where(accept, chi2_new, chi2)
        return (est_next, lam_next, nu_next, chi2_next), None

    chi2_0 = soa_chi2_chunked(obs.est0, prep, w2d, w3d, wg, ground_normal,
                              K, hd)
    init = (obs.est0, jnp.full((O,), -1.0, f32), jnp.full((O,), 2.0, f32),
            chi2_0)
    (e_fin, _, _, chi2_fin), _ = jax.lax.scan(step, init, None,
                                              length=cfg.iters)

    has_edges = (jnp.sum(w2d, axis=1) + jnp.sum(w3d, axis=1)) > 0
    keep = (obs.obj_mask & has_edges)[:, None]
    return jnp.where(keep, e_fin, obs.est0), chi2_fin
