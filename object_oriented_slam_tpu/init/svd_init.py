"""Multi-view SVD quadric initialization.

TPU-native re-design of ``/root/reference/src/core/Initializer.cpp``:
from >=3 (bbox, camera pose) pairs, each bbox edge becomes an image line,
back-projected to a tangent plane pi = P^T l (Initializer.cpp:58-91); each
plane yields one linear constraint on the 10-vec dual quadric
(Initializer.cpp:147-164); the least-squares quadric is the last right
singular vector of the stacked constraints (Initializer.cpp:166-184);
Q* is decomposed into an ellipsoid via eigen-decompositions
(Initializer.cpp:186-248).

Differences from the reference (all deliberate, TPU-first):
  * fixed-capacity masked arrays instead of dynamically grown matrices --
    invalid bbox edges (border-marked -1 coordinates, Initializer.cpp:120-144)
    become zeroed constraint rows, which contribute nothing to the
    least-squares system;
  * constraint rows are unit-normalized for float32 conditioning (the
    homogeneous solution is invariant to per-row scaling up to LS weighting);
  * everything is jit/vmap friendly: ``init_quadric_svd`` processes one
    candidate object, and can be vmapped over many candidates at once.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..ops import linalg

_EPS = 1e-12


class InitResult(NamedTuple):
    ellipsoid: jnp.ndarray  # vec10
    ok: jnp.ndarray         # bool scalar
    n_planes: jnp.ndarray   # int scalar


def tangent_planes(pose_wc: jnp.ndarray, bbox: jnp.ndarray, K: jnp.ndarray,
                   rows: int, cols: int):
    """Planes from one (pose, bbox) pair.

    Returns (planes [4,4], valid [4]) -- the four bbox-edge tangent planes in
    world frame and their validity (edge not on the image boundary,
    Initializer.cpp:107-145; whole detection invalid when all coords < 1,
    Initializer.cpp:71).
    """
    x1, y1, x2, y2 = bbox[0], bbox[1], bbox[2], bbox[3]
    lines = jnp.array([
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
    ])
    lines = lines.at[:, 2].set(-bbox)  # line_i = (a, b, -coord)

    all_invalid = (x1 < 1) & (y1 < 1) & (x2 < 1) & (y2 < 1)
    valid = jnp.stack([
        (x1 > 0) & (x1 < cols - 1),
        (y1 > 0) & (y1 < rows - 1),
        (x2 > 0) & (x2 < cols - 1),
        (y2 > 0) & (y2 < rows - 1),
    ]) & ~all_invalid

    Tcw = se3.se3_to_mat(se3.se3_inv(pose_wc))
    P = K @ Tcw[:3, :]              # 3x4
    planes = lines @ P              # [4 lines, 4] = (P^T l)^T rows
    # Unit-normalize each plane's normal: scaling a tangent plane does not
    # change its tangency constraint, and without it the d^2 entry of the
    # quadratic constraint dwarfs the normal entries in float32 (the
    # reference runs in double and skips this, Initializer.cpp:80).
    nrm = jnp.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    planes = planes / jnp.maximum(nrm, _EPS)
    return planes, valid


def plane_to_constraint(pi: jnp.ndarray) -> jnp.ndarray:
    """10-vec quadratic constraint of a tangent plane (Initializer.cpp:147-164)."""
    p0, p1, p2, p3 = pi[0], pi[1], pi[2], pi[3]
    return jnp.stack([
        p0 * p0, 2 * p0 * p1, 2 * p0 * p2, 2 * p0 * p3,
        p1 * p1, 2 * p1 * p2, 2 * p1 * p3,
        p2 * p2, 2 * p2 * p3, p3 * p3,
    ])


def qstar_from_constraints(A: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Least-squares dual quadric from masked constraint rows
    (Initializer.cpp:166-184). A: [N,10], mask: [N]."""
    A = jnp.where(mask[:, None], A, 0.0)
    # row normalization for conditioning (scale-invariant homogeneous system)
    norms = jnp.linalg.norm(A, axis=1, keepdims=True)
    A = A / jnp.maximum(norms, _EPS)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    q = Vt[-1]
    Qstar = jnp.array([
        [q[0], q[1], q[2], q[3]],
        [q[1], q[4], q[5], q[6]],
        [q[2], q[5], q[7], q[8]],
        [q[3], q[6], q[8], q[9]],
    ])
    return Qstar


def ellipsoid_from_qstar(Qstar: jnp.ndarray):
    """Decompose Q* -> (vec10, ok) (Initializer.cpp:186-248).

    ok requires the eigen signature of Q = Q*^-1 * cbrt(det Q*) to be
    (+++-) or (---+) (Initializer.cpp:197-207).

    Deliberate fix vs the reference: Initializer.cpp:219-227 derives the axis
    lengths from the eigenvalues of the full 4x4 Q, which is exact only for
    origin-centered quadrics (the translation shifts the 4x4 spectrum).  The
    exact central-quadric reduction uses the eigenvalues of the 3x3 block:
    ``axis_i = sqrt(-k / lambda_i(Q33))`` with ``k = det(Q)/det(Q33)``, whose
    eigenvectors are simultaneously the rotation (both are recovered from the
    same eigh).  This removes a translation-dependent scale bias the
    reference carries.
    """
    det = jnp.linalg.det(Qstar)
    # cbrt keeps entries O(1) for f32; the k/lambda ratio below is invariant
    # to this global scaling.
    Q = jnp.linalg.inv(Qstar) * jnp.cbrt(det)
    Q = 0.5 * (Q + Q.T)

    eigs = jnp.linalg.eigvalsh(Q)  # ascending
    num_pos = jnp.sum(eigs > 0)
    num_neg = jnp.sum(eigs < 0)
    ok = ((num_pos == 3) & (num_neg == 1)) | ((num_pos == 1) & (num_neg == 3))

    # orient the sign so Q33 is positive definite (ellipsoid normal form)
    Q33 = Q[:3, :3]
    Q = jnp.where(jnp.trace(Q33) < 0, -Q, Q)
    Q33 = Q[:3, :3]

    # exact reduction: eigenvalues/vectors of Q33
    # closed form (ops/linalg.eigh3): lax's eigh serializes on TPU
    w33, V33 = linalg.eigh3(Q33)  # ascending, positive for an ellipsoid
    k = jnp.linalg.det(Q) / jnp.linalg.det(Q33)  # negative for an ellipsoid
    s = jnp.sqrt(jnp.abs(-k / w33))

    # translation from Q*'s last column (Initializer.cpp:229-231)
    t = Qstar[:, 3] / Qstar[3, 3]

    # rotation: eigenvectors of Q33 (Initializer.cpp:233-239); enforce a
    # right-handed frame, then roundtrip through euler like the reference
    # (rot_to_euler_zyx -> fromMinimalVector).
    V33 = jnp.where(jnp.linalg.det(V33) < 0, -V33, V33)
    rpy = se3.rot_to_euler_zyx(V33)
    q = se3.zyx_euler_to_quat(rpy[0], rpy[1], rpy[2])

    vec10 = jnp.concatenate([t[:3], q, s])
    ok = ok & jnp.all(jnp.isfinite(vec10))
    return vec10, ok


def init_quadric_svd(pose_mat: jnp.ndarray, bbox_mat: jnp.ndarray,
                     obs_mask: jnp.ndarray, K: jnp.ndarray,
                     rows: int, cols: int) -> InitResult:
    """Initialize one quadric from masked observations.

    pose_mat: [M, 7] Twc per observation; bbox_mat: [M, 4] (x1 y1 x2 y2,
    border coords marked -1); obs_mask: [M] validity.  Requires >= 9 valid
    planes (Initializer.cpp:38-43).
    """
    planes, valid = jax.vmap(
        lambda p, b: tangent_planes(p, b, K, rows, cols))(pose_mat, bbox_mat)
    valid = valid & obs_mask[:, None]
    planes = planes.reshape(-1, 4)
    valid = valid.reshape(-1)

    n_planes = jnp.sum(valid)
    A = jax.vmap(plane_to_constraint)(planes)
    Qstar = qstar_from_constraints(A, valid)
    vec10, ok = ellipsoid_from_qstar(Qstar)
    ok = ok & (n_planes >= 9)
    return InitResult(vec10, ok, n_planes)


def quadric_plane_error(e_vec10: jnp.ndarray, pose_mat, bbox_mat, obs_mask,
                        K, rows, cols) -> jnp.ndarray:
    """Residual metric pi^T Q* pi summed over valid planes
    (Initializer.cpp:271-284), useful for validating an initialization."""
    from ..core import ellipsoid as ell
    planes, valid = jax.vmap(
        lambda p, b: tangent_planes(p, b, K, rows, cols))(pose_mat, bbox_mat)
    valid = valid & obs_mask[:, None]
    planes = planes.reshape(-1, 4)
    planes = planes / jnp.maximum(
        jnp.linalg.norm(planes, axis=1, keepdims=True), _EPS)
    valid = valid.reshape(-1)
    Qs = ell.quadric_Qstar(e_vec10)
    r = jnp.einsum("ni,ij,nj->n", planes, Qs, planes)
    r = jnp.where(valid, r, 0.0)
    return jnp.sum(r * r)
