"""Factor residuals for the object-SLAM graph.

TPU-native re-design of the reference's g2o edges
(``/root/reference/src/core/BasicEllipsoidEdges.cpp``):

  * 2D projection edge ``EdgeSE3EllipsoidProj`` (:102-112): residual =
    projected conic bbox minus measured bbox, per coordinate, with
    coordinates whose measurement is < 5 (border-invalidated to -1)
    contributing zero.
  * 3D edge ``EdgeSE3Ellipsoid9DOF`` (:68-77): 9-DoF rotation-aware log
    error between the map ellipsoid and the measured camera-local ellipsoid
    transformed to world.
  * gravity prior ``EdgeEllipsoidGravityPlanePrior`` (:129-152): angle
    between the ellipsoid z-axis and the ground-plane normal.
  * odometry edge ``EdgeSE3Expmap`` (g2o types_six_dof_expmap.h), SLAM mode.

All residuals are plain differentiable functions of the vertex estimates;
jacobians come from ``jax.jacfwd`` (the reference uses numeric differencing).
Information matrices are expressed as per-residual sqrt-weights so weighted
least squares reduces to an ordinary JtJ build.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core import ellipsoid as ell
from ..core import se3


def residual_proj(e_vec10: jnp.ndarray, pose_cw: jnp.ndarray,
                  K: jnp.ndarray, meas_bbox: jnp.ndarray) -> jnp.ndarray:
    """2D projection residual (4,) (BasicEllipsoidEdges.cpp:102-112).

    Coordinates with measurement < 5 are invalid and contribute 0.
    """
    proj = ell.project_bbox(e_vec10, pose_cw, K)
    return jnp.where(meas_bbox >= 5.0, proj - meas_bbox, 0.0)


def residual_3d(e_vec10: jnp.ndarray, pose_wc: jnp.ndarray,
                meas_local_vec10: jnp.ndarray) -> jnp.ndarray:
    """3D ellipsoid residual (9,) (BasicEllipsoidEdges.cpp:68-77)."""
    meas_world = ell.transform_from(meas_local_vec10, pose_wc)
    return ell.min_log_error_9dof(e_vec10, meas_world)


def precompute_3d_measurement(pose_wc: jnp.ndarray,
                              meas_local_vec10: jnp.ndarray):
    """Hoist the estimate-independent part of the 3D residual.

    The measured local ellipsoid transformed to world, its four yaw
    rotations and their INVERTED poses are all constant across LM
    iterations; precomputing them removes transform_from + rotate_yaw +
    se3_inv from every jacobian evaluation.
    Returns (inv_pose4 [4,7], scale4 [4,3]).
    """
    meas_world = ell.transform_from(meas_local_vec10, pose_wc)
    rots = [ell.rotate_yaw(meas_world, k) for k in (-1, 0, 1, 2)]
    inv_pose4 = jnp.stack([se3.se3_inv(r[:7]) for r in rots])
    scale4 = jnp.stack([r[7:10] for r in rots])
    return inv_pose4, scale4


def residual_3d_pre(e_vec10: jnp.ndarray, inv_pose4: jnp.ndarray,
                    scale4: jnp.ndarray) -> jnp.ndarray:
    """residual_3d with precomputed measurement rotations (identical
    output to residual_3d; see precompute_3d_measurement)."""
    import jax

    def err_k(invp, sc):
        pose_diff = se3.se3_mul(invp, e_vec10[:7])
        return jnp.concatenate([se3.se3_log(pose_diff), e_vec10[7:10] - sc])

    errs = jax.vmap(err_k)(inv_pose4, scale4)
    norms = jnp.sum(errs * errs, axis=1)
    idx = jax.lax.stop_gradient(jnp.argmin(norms))
    return errs[idx]


def residual_gravity(e_vec10: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Gravity-prior residual (1,) (BasicEllipsoidEdges.cpp:129-152)."""
    R = se3.quat_to_mat(e_vec10[3:7])
    z_axis = R[:, 2]
    cos_angle = jnp.dot(z_axis, normal) / (
        jnp.linalg.norm(z_axis) * jnp.maximum(jnp.linalg.norm(normal), 1e-8))
    cos_angle = jnp.clip(cos_angle, -1.0 + 1e-4, 1.0 - 1e-4)
    return jnp.arccos(cos_angle)[None]


def residual_odometry(pose_i_cw: jnp.ndarray, pose_j_cw: jnp.ndarray,
                      meas_ij: jnp.ndarray) -> jnp.ndarray:
    """Odometry residual (6,) between consecutive camera vertices.

    Matches g2o EdgeSE3Expmap semantics with measurement
    ``meas_ij = Tcw_j * Twc_i`` (Optimizer.cpp:142-158):
    error = log(meas^-1 * Tcw_j * Tcw_i^-1)... expressed so that a
    consistent (pose_i, pose_j) pair gives zero.
    """
    delta = se3.se3_mul(se3.se3_mul(se3.se3_inv(meas_ij), pose_j_cw),
                        se3.se3_inv(pose_i_cw))
    return se3.se3_log(delta)
