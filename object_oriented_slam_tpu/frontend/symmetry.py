"""Symmetry-plane estimation and point-cloud completion.

TPU-native re-design of ``src/symmetry/Symmetry.cpp`` +
``src/symmetry/SymmetrySolver.cpp``:

  * 9 initial planes: distances {-0.2, 0, 0.2} m x angles {-5, 0, +5} deg
    (GenerateInitPlanes, Symmetry.cpp:44-86)
  * each optimized 5 LM iterations over (azimuth, distance) -- or
    (azimuth, distance, dual-distance) for dual reflection -- with numeric
    jacobians, exactly like the reference's g2o numeric differentiation
    (SymmetrySolver.cpp:217-333)
  * cost (GetPointCloudProb, :49-138): mirror the cloud across the
    candidate plane(s); mirrored points that project inside the bbox onto
    occluded depth (d == 0 or point behind the measured surface) cost 0;
    otherwise cost = distance to the nearest original point; per-point
    ln P = -0.5 (d / Sigma)^2, averaged; error = -mean ln P
  * winning plane = max probability = exp(-error) (Symmetry.cpp:107-127)
  * completion (EllipsoidExtractor.cpp:399-446): mirrored points merged
    into the object cloud, cloud recentered, object frame re-derived from
    the symmetry-plane normal

The reference's KdTreeFLANN 1-NN becomes a masked [M, S] distance-matrix
minimum -- dense matmul-shaped work that the MXU eats -- and the
9-plane x D-detection search is a single vmap lattice.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import plane as pl
from ..core import se3
from ..core.camera import Camera

# label -> symmetry type {0 none, 1 reflection, 2 dual reflection}
# (LoadSymmetryPrior, EllipsoidExtractor.cpp:52-79)
SYMMETRY_PRIOR = {58: 0, 59: 1, 62: 1, 57: 1, 66: 1, 63: 1, 64: 1,
                  41: 1, 28: 2}


def sym_type_of_labels(labels):
    """Host helper: labels array -> sym types array."""
    import numpy as np
    return np.array([SYMMETRY_PRIOR.get(int(l), 0) for l in labels], np.int32)


@dataclasses.dataclass(frozen=True)
class SymmetryConfig:
    sigma: float = 0.1          # SymmetrySolver.Sigma
    iters: int = 5              # SymmetrySolver.cpp:263
    step_dis: float = 0.2       # GenerateInitPlanes
    step_angle_deg: float = 5.0
    num_delta: float = 1e-3     # numeric-jacobian step
    # exact reverse-mode gradient of the (differentiable) cost instead of
    # the reference's central differences (SymmetrySolver.cpp uses g2o
    # numeric diff only because its cost walks a KdTree): one backward
    # pass replaces 2*n_par forward cost evaluations per LM iteration —
    # ~3x less device work for the dual-plane search.  Deviation noted
    # in PARITY.md; set False for numeric-diff-faithful iterates.
    analytic_grad: bool = True


def _plane_from_params(angle, dis):
    """fromDisAngleTrans (Plane.cpp:97-105)."""
    return jnp.stack([jnp.sin(angle), -jnp.cos(angle),
                      jnp.zeros_like(angle), -dis])


def _nn_dist2(query, ref, r_mask):
    """Min SQUARED distance from each query point to the masked reference
    cloud.  query [M,3], ref [S,3] -> [M]; distance-matrix form runs on
    the MXU.  Squared form (the Gaussian cost only ever uses d^2) avoids
    a sqrt whose derivative blows up at d=0 — points lying exactly on the
    candidate plane mirror onto themselves — keeping the cost safe for
    ``jax.grad`` (SymmetryConfig.analytic_grad)."""
    d2 = (jnp.sum(query * query, axis=1)[:, None]
          + jnp.sum(ref * ref, axis=1)[None, :]
          - 2.0 * query @ ref.T)
    d2 = jnp.where(r_mask[None, :], d2, jnp.float32(1e30))
    return jnp.maximum(jnp.min(d2, axis=1), 0.0)


def _mirror_cost(planes, pts, mask, bbox, pose_oc, proj_depth, cam: Camera,
                 sigma):
    """Cost of a candidate plane set (1 or 2 planes stacked [P,4]).

    Mirrors the cloud across each plane, scores all mirrored points with
    the occlusion-aware Gaussian NN model, returns -mean ln P.
    """
    P_, S = planes.shape[0], pts.shape[0]
    mirrored = jax.vmap(lambda p: pl.mirror_points(p, pts))(planes)
    mirrored = mirrored.reshape(P_ * S, 3)
    m_mask = jnp.tile(mask, (P_,))

    # project into the image: T_c<-o = inv(pose_oc)
    Tco = se3.se3_inv(pose_oc)
    R = se3.quat_to_mat(Tco[3:])
    pc = mirrored @ R.T + Tco[:3]
    u = cam.fx * pc[:, 0] / jnp.maximum(pc[:, 2], 1e-6) + cam.cx
    v = cam.fy * pc[:, 1] / jnp.maximum(pc[:, 2], 1e-6) + cam.cy
    xi = u.astype(jnp.int32)
    yi = v.astype(jnp.int32)
    H, W = proj_depth.shape
    inside_img = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (pc[:, 2] > 0)
    in_bbox = ((bbox[0] < xi) & (xi < bbox[2]) & (bbox[1] < yi)
               & (yi < bbox[3]) & inside_img)

    d_meas = proj_depth[jnp.clip(yi, 0, H - 1),
                        jnp.clip(xi, 0, W - 1)] / cam.scale
    cam_c = pose_oc[:3]  # camera center in the normalized frame
    dis_cam = jnp.linalg.norm(mirrored - cam_c, axis=1)
    occluded = in_bbox & ((d_meas <= 1e-9) | (dis_cam > d_meas))

    nn2 = _nn_dist2(mirrored, pts, mask)
    d2 = jnp.where(occluded | ~m_mask, 0.0, nn2)

    inv_sig = 1.0 / sigma
    ln_p = -0.5 * inv_sig * inv_sig * d2
    n_valid = jnp.maximum(jnp.sum(m_mask), 1.0)
    return -jnp.sum(jnp.where(m_mask, ln_p, 0.0)) / n_valid


class SymResult(NamedTuple):
    plane: jnp.ndarray      # (4,) in the normalized frame
    dual_dis: jnp.ndarray   # scalar; second plane = dual_other_plane
    prob: jnp.ndarray
    error: jnp.ndarray


def _optimize_one_init(init_angle, init_dis, pts, mask, bbox, pose_oc,
                       proj_depth, cam, cfg: SymmetryConfig, dual: bool):
    """5-iteration LM on plane parameters from one initialization."""
    n_par = 3 if dual else 2

    def planes_of(params):
        # params: [azimuth-ish angle, distance, (dual distance)]
        p1 = _plane_from_params(params[0], params[1])
        if dual:
            p2 = pl.dual_other_plane(p1, params[2])
            return jnp.stack([p1, p2])
        return p1[None]

    def cost(params):
        return _mirror_cost(planes_of(params), pts, mask, bbox, pose_oc,
                            proj_depth, cam, cfg.sigma)

    p0 = jnp.zeros(n_par).at[0].set(init_angle).at[1].set(init_dis)

    def step(carry, _):
        params, lam, nu, c = carry
        if cfg.analytic_grad:
            g = jax.grad(cost)(params)            # exact gradient
        else:
            # numeric central-difference jacobian of the scalar cost
            h = cfg.num_delta
            eye = jnp.eye(n_par) * h
            cp = jax.vmap(lambda d: cost(params + d))(eye)
            cm = jax.vmap(lambda d: cost(params - d))(eye)
            g = (cp - cm) / (2 * h)               # gradient of cost
        # Gauss-Newton on the scalar residual r = cost (info=1):
        # J = g (1 x n), H = g g^T
        H = jnp.outer(g, g) * 1.0
        b = g * c
        lam0 = jnp.where(lam < 0, 1e-5 * jnp.maximum(jnp.max(jnp.diag(H)),
                                                     1e-6), lam)
        A = H + lam0 * jnp.eye(n_par)
        from ..ops.linalg import chol_solve_small
        du = -chol_solve_small(A, b)
        du = jnp.where(jnp.all(jnp.isfinite(du)), du, 0.0)
        p_new = params + du
        c_new = cost(p_new)
        accept = (c_new < c) & jnp.isfinite(c_new)
        return (jnp.where(accept, p_new, params),
                jnp.where(accept, lam0 / 3.0, lam0 * nu),
                jnp.where(accept, 2.0, nu * 2.0),
                jnp.where(accept, c_new, c)), None

    c0 = cost(p0)
    (p_fin, _, _, c_fin), _ = jax.lax.scan(
        step, (p0, jnp.float32(-1.0), jnp.float32(2.0), c0), None,
        length=cfg.iters)

    plane = _plane_from_params(p_fin[0], p_fin[1])
    dual_dis = p_fin[2] if dual else jnp.float32(0.0)
    return SymResult(plane=plane, dual_dis=dual_dis,
                     prob=jnp.exp(-c_fin), error=c_fin)


def estimate_symmetry(pts, mask, bbox, pose_oc, proj_depth, cam: Camera,
                      dual: bool, cfg: SymmetryConfig = SymmetryConfig()):
    """Grid of 9 initializations -> best SymResult (Symmetry.cpp:88-128)."""
    steps = jnp.array([-1.0, 0.0, 1.0])
    dis0 = steps * cfg.step_dis
    ang0 = steps * jnp.deg2rad(cfg.step_angle_deg)
    dd, aa = jnp.meshgrid(dis0, ang0)
    dd, aa = dd.reshape(-1), aa.reshape(-1)

    res = jax.vmap(lambda a, d: _optimize_one_init(
        a, d, pts, mask, bbox, pose_oc, proj_depth, cam, cfg, dual))(aa, dd)
    best = jnp.argmax(res.prob)
    return SymResult(plane=res.plane[best], dual_dis=res.dual_dis[best],
                     prob=res.prob[best], error=res.error[best])


def complete_cloud(pts, mask, result: SymResult, dual: bool):
    """Mirror-merge the object cloud and re-derive the object frame
    (EllipsoidExtractor.cpp:399-446).

    Returns (pts_m [4S, 3] in the NEW normalized frame, mask_m [4S],
    Tom pose7 mapping new frame -> old normalized frame).
    """
    S = pts.shape[0]
    m1 = pl.mirror_points(result.plane, pts)
    if dual:
        plane2 = pl.dual_other_plane(result.plane, result.dual_dis)
        m2 = pl.mirror_points(plane2, pts)
        m12 = pl.mirror_points(plane2, m1)
        all_pts = jnp.concatenate([pts, m1, m2, m12])
        all_mask = jnp.tile(mask, (4,))
    else:
        all_pts = jnp.concatenate([pts, m1, pts, m1])
        all_mask = jnp.concatenate([mask, mask,
                                    jnp.zeros_like(mask),
                                    jnp.zeros_like(mask)])

    w = all_mask.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    center = jnp.sum(all_pts * w[:, None], axis=0) / n

    # new frame: x = symmetry-plane normal, z = (0,0,1), y = z cross x
    nx = result.plane[:3] / jnp.maximum(
        jnp.linalg.norm(result.plane[:3]), 1e-9)
    nz = jnp.array([0.0, 0.0, 1.0])
    ny = jnp.cross(nz, nx)
    R_om = jnp.stack([nx, ny, nz], axis=1)
    Tom = jnp.concatenate([center, se3.mat_to_quat(R_om)])

    Tmo = se3.se3_inv(Tom)
    Rmo = se3.quat_to_mat(Tmo[3:])
    out = all_pts @ Rmo.T + Tmo[:3]
    out = jnp.where(all_mask[:, None], out, 0.0)
    return out, all_mask, Tom
