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


def _mirror_cost(planes, ptsT, ref_nrm, mask, bbox, pose_oc, proj_depth,
                 cam: Camera, sigma, src_mask=None, row0=0, hw=None):
    """Cost of a candidate plane set (1 or 2 planes stacked [P,4]).

    Mirrors the cloud across each plane, scores all mirrored points with
    the occlusion-aware Gaussian NN model, returns -mean ln P.

    ``src_mask`` (sparse symmetry mode, SymmetrySolver.cpp:387-388): only
    these points are mirrored and scored — the reference swaps the
    mirrored source for the depth-border cloud while the 1-NN reference
    set stays the full object cloud (the KdTree is built on ``mpCloud``).

    SoA layout: ``ptsT`` is the object cloud coords-first [3, S] and all
    per-point work runs componentwise on [P*S] lane vectors — a [M, 3]
    layout would tile-pad the 3-wide trailing dim to 128 lanes (~40x
    bandwidth waste) in every op of this innermost LM chain.  The NN
    min uses the same norm-expansion distance matrix (MXU) as before;
    its squared form avoids a sqrt whose derivative blows up at d=0
    (points on the candidate plane mirror onto themselves), keeping the
    cost safe for ``jax.grad`` (SymmetryConfig.analytic_grad).
    """
    x, y, z = ptsT[0], ptsT[1], ptsT[2]
    mxs, mys, mzs = [], [], []
    for k in range(planes.shape[0]):
        p = planes[k]
        n0, n1, n2c, d = p[0], p[1], p[2], p[3]
        n2sum = jnp.maximum(n0 * n0 + n1 * n1 + n2c * n2c, 1e-8)
        s = (n0 * x + n1 * y + n2c * z + d) / n2sum
        mxs.append(x - 2.0 * s * n0)
        mys.append(y - 2.0 * s * n1)
        mzs.append(z - 2.0 * s * n2c)
    mx = jnp.concatenate(mxs)
    my = jnp.concatenate(mys)
    mz = jnp.concatenate(mzs)
    q_mask = mask if src_mask is None else src_mask
    m_mask = jnp.tile(q_mask, (planes.shape[0],))

    # project into the image: T_c<-o = inv(pose_oc)
    Tco = se3.se3_inv(pose_oc)
    R = se3.quat_to_mat(Tco[3:])
    pcx = R[0, 0] * mx + R[0, 1] * my + R[0, 2] * mz + Tco[0]
    pcy = R[1, 0] * mx + R[1, 1] * my + R[1, 2] * mz + Tco[1]
    pcz = R[2, 0] * mx + R[2, 1] * my + R[2, 2] * mz + Tco[2]
    u = cam.fx * pcx / jnp.maximum(pcz, 1e-6) + cam.cx
    v = cam.fy * pcy / jnp.maximum(pcz, 1e-6) + cam.cy
    xi = u.astype(jnp.int32)
    yi = v.astype(jnp.int32)
    # row0/hw: multi-frame batches stack B proj maps as one [B*H, W]
    # array with per-detection row offsets so the gather operand stays
    # unmapped 2D under the detection vmap (see ops/backproject.py)
    H, W = hw if hw is not None else proj_depth.shape
    inside_img = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H) & (pcz > 0)
    in_bbox = ((bbox[0] < xi) & (xi < bbox[2]) & (bbox[1] < yi)
               & (yi < bbox[3]) & inside_img)

    d_meas = proj_depth[row0 + jnp.clip(yi, 0, H - 1),
                        jnp.clip(xi, 0, W - 1)] / cam.scale
    cx0, cy0, cz0 = pose_oc[0], pose_oc[1], pose_oc[2]  # camera center
    dis_cam = jnp.sqrt((mx - cx0) ** 2 + (my - cy0) ** 2 + (mz - cz0) ** 2)
    occluded = in_bbox & ((d_meas <= 1e-9) | (dis_cam > d_meas))

    # min squared distance to the masked reference cloud (MXU matmul)
    q_nrm = mx * mx + my * my + mz * mz
    cross = jax.lax.dot_general(jnp.stack([mx, my, mz]), ptsT,
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    d2m = q_nrm[:, None] + ref_nrm[None, :] - 2.0 * cross
    d2m = jnp.where(mask[None, :], d2m, jnp.float32(1e30))
    nn2 = jnp.maximum(jnp.min(d2m, axis=1), 0.0)
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


def _optimize_one_init(init_angle, init_dis, ptsT, ref_nrm, mask, bbox,
                       pose_oc, proj_depth, cam, cfg: SymmetryConfig,
                       dual: bool, src_mask=None, row0=0, hw=None):
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
        return _mirror_cost(planes_of(params), ptsT, ref_nrm, mask, bbox,
                            pose_oc, proj_depth, cam, cfg.sigma,
                            src_mask=src_mask, row0=row0, hw=hw)

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
                      dual: bool, cfg: SymmetryConfig = SymmetryConfig(),
                      src_mask=None, row0=0, hw=None):
    """Grid of 9 initializations -> best SymResult (Symmetry.cpp:88-128).

    ``src_mask`` enables the sparse estimation mode (Symmetry::SetBorders,
    Symmetry.cpp:163-167): only the masked points (depth-border points)
    are mirrored and scored; the NN reference stays the full cloud.
    """
    steps = jnp.array([-1.0, 0.0, 1.0])
    dis0 = steps * cfg.step_dis
    ang0 = steps * jnp.deg2rad(cfg.step_angle_deg)
    dd, aa = jnp.meshgrid(dis0, ang0)
    dd, aa = dd.reshape(-1), aa.reshape(-1)

    ptsT = pts.T                                  # [3, S] coords-first
    ref_nrm = jnp.sum(pts * pts, axis=1)
    res = jax.vmap(lambda a, d: _optimize_one_init(
        a, d, ptsT, ref_nrm, mask, bbox, pose_oc, proj_depth, cam, cfg,
        dual, src_mask=src_mask, row0=row0, hw=hw))(aa, dd)
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
