"""float64 numpy replica of the reference's SLAM-mode global graph.

The reference's ``bSLAM_mode`` branch (``/root/reference/src/core/
Optimizer.cpp:126-158``) frees the camera poses (frame 0 fixed,
``:138``), adds chained odometry edges with identity information
(``:142-158``; ``EdgeSE3Expmap::computeError`` = ``log(C * Tcw_i *
Tcw_j^-1)``, ``Thirdparty/g2o/g2o/types/types_six_dof_expmap.h:90-99``)
and keeps the mapping-mode 2D projection / 3D ellipsoid / gravity edges,
now with free pose vertices (``VertexSE3Expmap::oplusImpl`` =
``exp(u) * Tcw``, ``types_six_dof_expmap.h:73-76``).

This replica runs the joint LM in float64 with numeric central-difference
jacobians and a dense solve over [6F + 9K] (g2o's numeric-diff default
for the project's edges) and the same lambda schedule as
``backend/slam_ba.optimize_slam`` (tau*maxdiag init, /3 on accept,
*nu on reject) so iterates are comparable edge-for-edge.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from bench import (np_exp_update, np_min_log_error_9dof,  # noqa: E402
                   np_project_bbox, np_residual_gravity, np_se3_inv,
                   np_se3_log, np_se3_mat, np_se3_mul, np_mat_to_pose7)

_TAU = 1e-5


def np_se3_exp(u):
    """SE3 exp, tangent [omega, upsilon] -> pose7 (g2o SE3Quat::exp)."""
    omega, ups = u[:3], u[3:6]
    th = np.linalg.norm(omega)

    def _skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]],
                         [-v[1], v[0], 0]])

    if th < 1e-10:
        R = np.eye(3) + _skew(omega)
        V = np.eye(3)
    else:
        K = _skew(omega / th)
        R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
        V = (np.eye(3) + (1 - np.cos(th)) / th * K
             + (th - np.sin(th)) / th * K @ K)
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = V @ ups
    return np_mat_to_pose7(M)


def slam_residuals(poses_cw, objects, edges):
    """Stacked weighted residual vector of the SLAM-mode graph.

    edges = dict with lists:
      e2: (frame, obj, bbox4, sqrt_w)        info = I4 * prob
      e3: (frame, obj, meas_local10, sqrt_w) info = I9 * prob * scale
      odo: (i, j, meas_pose7, sqrt_w)        info = I6
      grav: (obj, normal3, sqrt_w)
    """
    rs = []
    for f, o, bbox, w in edges.get("e2", []):
        proj = np_project_bbox(objects[o], poses_cw[f], None_K[0])
        rs.append(np.where(np.asarray(bbox) >= 5, proj - bbox, 0.0) * w)
    for f, o, meas, w in edges.get("e3", []):
        # measurement transformed to world with the CURRENT pose estimate
        # (EdgeSE3Ellipsoid9DOF::computeError, BasicEllipsoidEdges.cpp:68-77)
        p_wc = np_se3_inv(poses_cw[f])
        mw = np.r_[np_se3_mul(p_wc, meas[:7]), meas[7:]]
        rs.append(np_min_log_error_9dof(objects[o], mw) * w)
    for i, j, meas, w in edges.get("odo", []):
        delta = np_se3_mul(np_se3_mul(meas, poses_cw[i]),
                           np_se3_inv(poses_cw[j]))
        rs.append(np_se3_log(delta) * w)
    for o, normal, w in edges.get("grav", []):
        rs.append(np_residual_gravity(objects[o], normal) * w)
    return np.concatenate(rs) if rs else np.zeros(0)


# module-level K holder so np_project_bbox sees the right intrinsics
# without threading it through every residual call
None_K = [None]


def optimize_slam_np(poses_cw, objects, edges, K, iters=10, h=1e-6):
    """Joint LM, frame 0 fixed; returns (poses, objects, chi2_trace)."""
    None_K[0] = K
    poses = np.asarray(poses_cw, np.float64).copy()
    objs = np.asarray(objects, np.float64).copy()
    F, Kn = len(poses), len(objs)
    n_var = 6 * F + 9 * Kn

    def apply(x, dx):
        p, ob = x
        p2 = p.copy()
        for f in range(1, F):  # frame 0 fixed (Optimizer.cpp:138)
            p2[f] = np_se3_mul(np_se3_exp(dx[6 * f:6 * f + 6]), p[f])
        ob2 = np.stack([np_exp_update(ob[k],
                                      dx[6 * F + 9 * k:6 * F + 9 * k + 9])
                        for k in range(Kn)]) if Kn else ob
        return p2, ob2

    def residual(x):
        return slam_residuals(x[0], x[1], edges)

    x = (poses, objs)
    r = residual(x)
    chi2 = float(r @ r)
    trace = [chi2]
    lam, nu = -1.0, 2.0
    for _ in range(iters):
        r = residual(x)
        J = np.zeros((r.size, n_var))
        for k in range(n_var):
            if 0 <= k < 6:
                continue  # fixed frame 0 columns stay zero
            dx = np.zeros(n_var)
            dx[k] = h
            rp = residual(apply(x, dx))
            dx[k] = -h
            rm = residual(apply(x, dx))
            J[:, k] = (rp - rm) / (2 * h)
        H = J.T @ J
        g = J.T @ r
        if lam < 0:
            lam = _TAU * float(np.max(np.diag(H)))
        A = H + lam * np.eye(n_var)
        # fixed frame 0: keep its block identity so the solve is regular
        A[:6, :6] = np.eye(6)
        g2 = g.copy()
        g2[:6] = 0.0
        du = -np.linalg.solve(A, g2)
        du[:6] = 0.0
        x_new = apply(x, du)
        r_new = residual(x_new)
        chi2_new = float(r_new @ r_new)
        if np.isfinite(chi2_new) and chi2_new < chi2:
            x, chi2 = x_new, chi2_new
            lam /= 3.0
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
        trace.append(chi2)
    return x[0], x[1], trace
