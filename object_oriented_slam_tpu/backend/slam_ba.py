"""SLAM-mode bundle adjustment: free camera poses + object landmarks.

The reference's SLAM mode exists behind the hardcoded ``bSLAM_mode`` flag
(``/root/reference/src/core/Optimizer.cpp:126,142-158``): camera vertices
become free (frame 0 fixed), consecutive frames are tied by odometry edges
``EdgeSE3Expmap`` (measurement C = Tcw_j * Tcw_i^-1, error =
log(C * Tcw_i * Tcw_j^-1), g2o/types/types_six_dof_expmap.h:90-99), and the
same 2D/3D/gravity object factors couple poses and landmarks.

TPU-first design:
  * the full graph is fixed-capacity edge arrays (frame idx, object idx,
    measurement, weight) -- no pointer graph;
  * per-edge jacobians w.r.t. the 15-dim (pose, object) tangent via jacfwd;
  * normal equations assembled with segment_sum scatters into dense blocks:
    Hpp [F,6,F,6] (block tri-diagonal + projection fill), Hoo [K,9,9]
    block diagonal, coupling U [F,K,6,9];
  * Schur complement marginalizes the 9x9 landmark blocks:
    S = Hpp - U Hoo^-1 U^T (einsum over landmarks -> MXU);
  * the reduced camera system is solved with block-Jacobi preconditioned
    conjugate gradient (fixed iteration count -- compiler-friendly, and the
    matvec psum-decomposes for the multi-host extension);
  * landmarks back-substitute in closed form.

Pose update convention matches g2o ``VertexSE3Expmap``: left-multiplicative
``Tcw' = exp(u) * Tcw``; object update is ellipsoid.exp_update.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import ellipsoid as ell
from ..core import se3
from ..ops.linalg import chol_solve_small
from . import residuals as res
from .lm import _TAU, LMConfig


class SlamGraph(NamedTuple):
    """Fixed-capacity SLAM factor graph.

    F frames, K objects, E2 2d edges, E3 3d edges, Eo odometry edges.
      poses_cw   [F, 7]   initial camera estimates (Tcw)
      frame_mask [F]
      objects    [K, 10]  initial landmark estimates
      obj_mask   [K]
      e2_frame   [E2] int32 ; e2_obj [E2] ; e2_bbox [E2,4] ; e2_w [E2]
      e3_frame   [E3] ; e3_obj [E3] ; e3_meas [E3,10] ; e3_w [E3]
      odo_i/odo_j [Eo] ; odo_meas [Eo,7] ; odo_w [Eo]
      grav_w     [K]  gravity sqrt-weight per object (0 = off)
    """
    poses_cw: jnp.ndarray
    frame_mask: jnp.ndarray
    objects: jnp.ndarray
    obj_mask: jnp.ndarray
    e2_frame: jnp.ndarray
    e2_obj: jnp.ndarray
    e2_bbox: jnp.ndarray
    e2_w: jnp.ndarray
    e3_frame: jnp.ndarray
    e3_obj: jnp.ndarray
    e3_meas: jnp.ndarray
    e3_w: jnp.ndarray
    odo_i: jnp.ndarray
    odo_j: jnp.ndarray
    odo_meas: jnp.ndarray
    odo_w: jnp.ndarray
    grav_w: jnp.ndarray


def _odo_residual(pose_i_cw, pose_j_cw, meas):
    """error = log(C * Tcw_i * Tcw_j^-1) (types_six_dof_expmap.h:90-99)."""
    delta = se3.se3_mul(se3.se3_mul(meas, pose_i_cw), se3.se3_inv(pose_j_cw))
    return se3.se3_log(delta)


def _edge_terms_2d(poses, objects, g: SlamGraph, K_mat):
    """Per-2D-edge residuals and jacobians [E2,4], [E2,4,6], [E2,4,9]."""
    def one(f, o, bbox, w):
        def rfun(up, uo):
            pose = se3.se3_mul(se3.se3_exp(up), poses[f])
            obj = ell.exp_update(objects[o], uo)
            return res.residual_proj(obj, pose, K_mat, bbox) * w
        z6, z9 = jnp.zeros(6), jnp.zeros(9)
        r = rfun(z6, z9)
        Jp = jax.jacfwd(rfun, argnums=0)(z6, z9)
        Jo = jax.jacfwd(rfun, argnums=1)(z6, z9)
        bad = ~jnp.all(jnp.isfinite(r))
        r = jnp.where(bad, 0.0, r)
        Jp = jnp.where(bad, 0.0, Jp)
        Jo = jnp.where(bad, 0.0, Jo)
        return r, Jp, Jo
    return jax.vmap(one)(g.e2_frame, g.e2_obj, g.e2_bbox, g.e2_w)


def _edge_terms_3d(poses, objects, g: SlamGraph):
    def one(f, o, meas, w):
        def rfun(up, uo):
            pose_cw = se3.se3_mul(se3.se3_exp(up), poses[f])
            obj = ell.exp_update(objects[o], uo)
            return res.residual_3d(obj, se3.se3_inv(pose_cw), meas) * w
        z6, z9 = jnp.zeros(6), jnp.zeros(9)
        r = rfun(z6, z9)
        Jp = jax.jacfwd(rfun, argnums=0)(z6, z9)
        Jo = jax.jacfwd(rfun, argnums=1)(z6, z9)
        bad = ~jnp.all(jnp.isfinite(r))
        return (jnp.where(bad, 0.0, r), jnp.where(bad, 0.0, Jp),
                jnp.where(bad, 0.0, Jo))
    return jax.vmap(one)(g.e3_frame, g.e3_obj, g.e3_meas, g.e3_w)


def _edge_terms_odo(poses, g: SlamGraph):
    def one(i, j, meas, w):
        def rfun(ui, uj):
            pi = se3.se3_mul(se3.se3_exp(ui), poses[i])
            pj = se3.se3_mul(se3.se3_exp(uj), poses[j])
            return _odo_residual(pi, pj, meas) * w
        z = jnp.zeros(6)
        r = rfun(z, z)
        Ji = jax.jacfwd(rfun, argnums=0)(z, z)
        Jj = jax.jacfwd(rfun, argnums=1)(z, z)
        bad = ~jnp.all(jnp.isfinite(r))
        return (jnp.where(bad, 0.0, r), jnp.where(bad, 0.0, Ji),
                jnp.where(bad, 0.0, Jj))
    return jax.vmap(one)(g.odo_i, g.odo_j, g.odo_meas, g.odo_w)


def _edge_terms_grav(objects, g: SlamGraph, normal):
    def one(o_idx, w):
        def rfun(uo):
            return res.residual_gravity(ell.exp_update(objects[o_idx], uo),
                                        normal) * w
        z = jnp.zeros(9)
        r = rfun(z)
        Jo = jax.jacfwd(rfun)(z)
        return r, Jo
    return jax.vmap(one)(jnp.arange(objects.shape[0]), g.grav_w)


def _chi2(poses, objects, g: SlamGraph, K_mat, normal):
    r2, _, _ = _edge_terms_2d(poses, objects, g, K_mat)
    r3, _, _ = _edge_terms_3d(poses, objects, g)
    ro, _, _ = _edge_terms_odo(poses, g)
    rg, _ = _edge_terms_grav(objects, g, normal)
    return (jnp.sum(r2 * r2) + jnp.sum(r3 * r3) + jnp.sum(ro * ro)
            + jnp.sum(rg * rg))


def _inv9(H):
    """Inverse of a 9x9 SPD block via 9 unrolled-Cholesky solves."""
    eye = jnp.eye(9, dtype=H.dtype)
    return jax.vmap(lambda col: chol_solve_small(H, col))(eye).T


def _pcg(matvec, b, Minv_blocks, iters):
    """Block-Jacobi preconditioned CG on the reduced camera system.

    b: [F, 6]; Minv_blocks: [F, 6, 6]; returns x [F, 6].
    """
    def precond(r):
        return jnp.einsum("fij,fj->fi", Minv_blocks, r)

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
        p = z + beta * p
        return (x, r, z, p, rz_new), None

    rz0 = jnp.sum(r0 * z0)
    (x, _, _, _, _), _ = jax.lax.scan(
        body, (x0, r0, z0, p0, rz0), None, length=iters)
    return x


def build_normal_equations(poses, objects, g: SlamGraph, K_mat, normal):
    """Assemble (Hpp [F,6,F,6], bp [F,6], Hoo [K,9,9], bo [K,9], U [F,K,6,9]).

    Pure function of the edge set: sharding the edge arrays and psum-ing
    the outputs yields the same equations (see parallel/dist_slam.py).
    """
    F = poses.shape[0]
    K = objects.shape[0]
    r2, Jp2, Jo2 = _edge_terms_2d(poses, objects, g, K_mat)
    r3, Jp3, Jo3 = _edge_terms_3d(poses, objects, g)
    ro, Ji, Jj = _edge_terms_odo(poses, g)
    rg, Jg = _edge_terms_grav(objects, g, normal)

    # ---- Hpp dense [F,6,F,6] ----------------------------------------
    Hpp = jnp.zeros((F, 6, F, 6))
    bp = jnp.zeros((F, 6))

    def scat_pp(Hpp, bp, fidx, Jp, r):
        Hblk = jnp.einsum("eai,eaj->eij", Jp, Jp)
        gblk = jnp.einsum("eai,ea->ei", Jp, r)
        Hd = jax.ops.segment_sum(Hblk, fidx, num_segments=F)
        gd = jax.ops.segment_sum(gblk, fidx, num_segments=F)
        Hpp = Hpp + jnp.einsum("fij,fg->figj", Hd,
                               jnp.eye(F, dtype=Hd.dtype))
        return Hpp, bp + gd

    Hpp, bp = scat_pp(Hpp, bp, g.e2_frame, Jp2, r2)
    Hpp, bp = scat_pp(Hpp, bp, g.e3_frame, Jp3, r3)
    Hpp, bp = scat_pp(Hpp, bp, g.odo_i, Ji, ro)
    Hpp, bp = scat_pp(Hpp, bp, g.odo_j, Jj, ro)
    # odometry off-diagonal blocks (i,j) and (j,i)
    Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
    flat = jax.ops.segment_sum(Hij, g.odo_i * F + g.odo_j,
                               num_segments=F * F).reshape(F, F, 6, 6)
    Hpp = Hpp + flat.transpose(0, 2, 1, 3)
    Hpp = Hpp + flat.transpose(1, 3, 0, 2)

    # ---- Hoo block diag [K,9,9], bo [K,9] ---------------------------
    Hoo = (jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", Jo2, Jo2),
                               g.e2_obj, num_segments=K)
           + jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", Jo3, Jo3),
                                 g.e3_obj, num_segments=K)
           + jnp.einsum("kai,kaj->kij", Jg, Jg))
    bo = (jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jo2, r2),
                              g.e2_obj, num_segments=K)
          + jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jo3, r3),
                                g.e3_obj, num_segments=K)
          + jnp.einsum("kai,ka->ki", Jg, rg))

    # ---- coupling U [F,K,6,9] ---------------------------------------
    U2 = jnp.einsum("eai,eaj->eij", Jp2, Jo2)
    U3 = jnp.einsum("eai,eaj->eij", Jp3, Jo3)
    U = (jax.ops.segment_sum(U2, g.e2_frame * K + g.e2_obj,
                             num_segments=F * K)
         + jax.ops.segment_sum(U3, g.e3_frame * K + g.e3_obj,
                               num_segments=F * K)).reshape(F, K, 6, 9)
    return Hpp, bp, Hoo, bo, U


def build_normal_equations_banded(poses, objects, g: SlamGraph, K_mat,
                                  normal):
    """Banded assembly: (D [F,6,6], B [F,6,6], bp, Hoo, bo, U [F,K,6,9]).

    The pose Hessian of this factor graph is block-TRIDIAGONAL:
    projection/3D edges touch one pose each (diagonal blocks only) and the
    odometry edges form a chain (Optimizer.cpp:142-158; build_slam_graph
    emits odo_j == odo_i + 1), so Hpp = tridiag(D, B) with B[f] the
    (f, f+1) coupling block (B[F-1] unused).  This replaces the dense
    [F,6,F,6] of ``build_normal_equations`` — O(F) memory instead of
    O(F^2), and the downstream Schur solve never materializes S.

    Precondition: active odometry edges satisfy odo_j == odo_i + 1
    (loop-closure edges would need a general sparse layout).
    """
    F = poses.shape[0]
    K = objects.shape[0]
    r2, Jp2, Jo2 = _edge_terms_2d(poses, objects, g, K_mat)
    r3, Jp3, Jo3 = _edge_terms_3d(poses, objects, g)
    ro, Ji, Jj = _edge_terms_odo(poses, g)
    rg, Jg = _edge_terms_grav(objects, g, normal)

    def seg_blk(J, r, idx):
        Hblk = jnp.einsum("eai,eaj->eij", J, J)
        gblk = jnp.einsum("eai,ea->ei", J, r)
        return (jax.ops.segment_sum(Hblk, idx, num_segments=F),
                jax.ops.segment_sum(gblk, idx, num_segments=F))

    D = jnp.zeros((F, 6, 6))
    bp = jnp.zeros((F, 6))
    for J, r, idx in ((Jp2, r2, g.e2_frame), (Jp3, r3, g.e3_frame),
                      (Ji, ro, g.odo_i), (Jj, ro, g.odo_j)):
        Hd, gd = seg_blk(J, r, idx)
        D = D + Hd
        bp = bp + gd

    # off-diagonal (i, i+1) blocks, keyed by the left frame
    Hij = jnp.einsum("eai,eaj->eij", Ji, Jj)
    B = jax.ops.segment_sum(Hij, g.odo_i, num_segments=F)

    Hoo = (jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", Jo2, Jo2),
                               g.e2_obj, num_segments=K)
           + jax.ops.segment_sum(jnp.einsum("eai,eaj->eij", Jo3, Jo3),
                                 g.e3_obj, num_segments=K)
           + jnp.einsum("kai,kaj->kij", Jg, Jg))
    bo = (jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jo2, r2),
                              g.e2_obj, num_segments=K)
          + jax.ops.segment_sum(jnp.einsum("eai,ea->ei", Jo3, r3),
                                g.e3_obj, num_segments=K)
          + jnp.einsum("kai,ka->ki", Jg, rg))

    U2 = jnp.einsum("eai,eaj->eij", Jp2, Jo2)
    U3 = jnp.einsum("eai,eaj->eij", Jp3, Jo3)
    U = (jax.ops.segment_sum(U2, g.e2_frame * K + g.e2_obj,
                             num_segments=F * K)
         + jax.ops.segment_sum(U3, g.e3_frame * K + g.e3_obj,
                               num_segments=F * K)).reshape(F, K, 6, 9)
    return D, B, bp, Hoo, bo, U


def _tridiag_matvec(D, B, x):
    """y[f] = D[f] x[f] + B[f] x[f+1] + B[f-1]^T x[f-1]."""
    y = jnp.einsum("fij,fj->fi", D, x)
    x_next = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])
    y = y + jnp.einsum("fij,fj->fi", B, x_next)
    up = jnp.einsum("fij,fi->fj", B, x)              # B[f]^T x[f] -> row f+1
    return y + jnp.concatenate([jnp.zeros_like(up[:1]), up[:-1]])


def solve_schur_step_banded(D, B, bp, Hoo, bo, U, lam, free_frame,
                            free_obj, cg_iters: int):
    """Damped Schur solve on the banded + low-rank reduced system.

    S = tridiag(D_d, B_d) - UM U^T is never materialized: the PCG matvec
    is the banded part (O(F)) plus the rank-9K correction
    UM (U^T x) (O(F K)), so the whole solve is O(F K) per iteration
    instead of solve_schur_step's O(F^2 K) assembly + O(F^2) matvec.
    Same damping, gauge, preconditioner, and iteration semantics.
    """
    # g2o builds the hessian over ACTIVE vertices only, so the tau*max-
    # diag lambda init never sees fixed frames' diagonals
    diag_pp = jnp.einsum("fii->fi", D) * free_frame[:, None]
    diag_oo = jnp.einsum("kii->ki", Hoo) * free_obj[:, None]
    maxdiag = jnp.maximum(jnp.max(jnp.abs(diag_pp)),
                          jnp.max(jnp.abs(diag_oo)))
    lam0 = jnp.where(lam < 0, _TAU * maxdiag, lam)
    lam0 = jnp.maximum(lam0, 1e-12)

    eye6 = jnp.eye(6)
    eye9 = jnp.eye(9)
    fm = free_frame.astype(D.dtype)
    om = free_obj.astype(Hoo.dtype)
    fm_next = jnp.concatenate([fm[1:], jnp.zeros_like(fm[:1])])

    D_d = D + lam0 * eye6[None]
    D_d = (D_d * fm[:, None, None]
           + eye6[None] * (1.0 - fm)[:, None, None])
    B_d = B * (fm * fm_next)[:, None, None]
    bp_m = bp * fm[:, None]
    Hoo_d = Hoo + lam0 * eye9[None]
    Hoo_d = (Hoo_d * om[:, None, None]
             + eye9[None] * (1.0 - om)[:, None, None])
    bo_m = bo * om[:, None]
    U_m = U * fm[:, None, None, None] * om[None, :, None, None]

    Minv = jax.vmap(_inv9)(Hoo_d)                    # [K,9,9]
    UM = jnp.einsum("fkab,kbc->fkac", U_m, Minv)     # [F,K,6,9]
    rhs = -bp_m + jnp.einsum("fkac,kc->fa", UM, bo_m)

    Sdiag = D_d - jnp.einsum("fkac,fkdc->fad", UM, U_m)
    Pinv = jax.vmap(_inv6)(Sdiag)

    def matvec(x):
        t = jnp.einsum("gkdc,gd->kc", U_m, x)        # U^T x  [K,9]
        return _tridiag_matvec(D_d, B_d, x) - jnp.einsum(
            "fkac,kc->fa", UM, t)

    dx_p = _pcg(matvec, rhs, Pinv, cg_iters)

    rhs_o = bo_m + jnp.einsum("fkac,fa->kc", U_m, dx_p)
    dx_o = -jnp.einsum("kbc,kc->kb", Minv, rhs_o)

    dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * fm[:, None]
    dx_o = jnp.where(jnp.isfinite(dx_o), dx_o, 0.0) * om[:, None]
    return dx_p, dx_o, lam0


def solve_schur_step(Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj,
                     cg_iters: int):
    """One damped Schur-complement solve from assembled normal equations.

    Returns (dx_p [F,6], dx_o [K,9], lam0) where lam0 is the damping
    actually applied (lam<0 requests g2o's tau*max-diag initialisation).
    """
    F = bp.shape[0]

    # active-vertex diag only for the lambda init (see banded variant)
    diag_pp = jnp.einsum("fifi->fi", Hpp) * free_frame[:, None]
    diag_oo = jnp.einsum("kii->ki", Hoo) * free_obj[:, None]
    maxdiag = jnp.maximum(jnp.max(jnp.abs(diag_pp)),
                          jnp.max(jnp.abs(diag_oo)))
    lam0 = jnp.where(lam < 0, _TAU * maxdiag, lam)
    lam0 = jnp.maximum(lam0, 1e-12)

    eyeF = jnp.eye(6)
    eyeK = jnp.eye(9)
    Hpp_d = Hpp + lam0 * jnp.einsum("fg,ij->figj", jnp.eye(F), eyeF)
    Hoo_d = Hoo + lam0 * eyeK[None]

    # gauge/mask handling: fixed frames/objects get identity rows
    fm = free_frame.astype(Hpp.dtype)
    om = free_obj.astype(Hoo.dtype)
    Hpp_d = (Hpp_d * fm[:, None, None, None] * fm[None, None, :, None]
             + jnp.einsum("fg,ij->figj", jnp.diag(1.0 - fm), eyeF))
    bp_m = bp * fm[:, None]
    Hoo_d = (Hoo_d * om[:, None, None]
             + eyeK[None] * (1.0 - om)[:, None, None])
    bo_m = bo * om[:, None]
    U_m = U * fm[:, None, None, None] * om[None, :, None, None]

    # Schur: S = Hpp - U Hoo^-1 U^T ; rhs = -bp + U Hoo^-1 bo
    Minv = jax.vmap(_inv9)(Hoo_d)                       # [K,9,9]
    UM = jnp.einsum("fkab,kbc->fkac", U_m, Minv)        # [F,K,6,9]
    S = Hpp_d - jnp.einsum("fkac,gkdc->fagd", UM, U_m)
    rhs = -bp_m + jnp.einsum("fkac,kc->fa", UM, bo_m)

    # block-Jacobi preconditioner from S's diagonal blocks
    Sdiag = jax.vmap(lambda f: S[f, :, f, :])(jnp.arange(F))
    Pinv = jax.vmap(_inv6)(Sdiag)

    def matvec(x):
        return jnp.einsum("fagd,gd->fa", S, x)

    dx_p = _pcg(matvec, rhs, Pinv, cg_iters)            # [F,6]

    # back-substitute landmarks: dx_o = -Minv (bo + U^T dx_p)
    rhs_o = bo_m + jnp.einsum("fkac,fa->kc", U_m, dx_p)
    dx_o = -jnp.einsum("kbc,kc->kb", Minv, rhs_o)

    dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * fm[:, None]
    dx_o = jnp.where(jnp.isfinite(dx_o), dx_o, 0.0) * om[:, None]
    return dx_p, dx_o, lam0


def apply_updates(poses, objects, dx_p, dx_o):
    poses_new = jax.vmap(
        lambda u, p: se3.se3_mul(se3.se3_exp(u), p))(dx_p, poses)
    objects_new = jax.vmap(ell.exp_update)(objects, dx_o)
    return poses_new, objects_new


def optimize_slam(g: SlamGraph, K_mat, normal, cfg: LMConfig = LMConfig(),
                  cg_iters: int = 64, banded: bool = False):
    """Joint pose+landmark LM with Schur-complement reduced solves.

    ``banded=True`` uses the block-tridiagonal + low-rank formulation
    (build_normal_equations_banded / solve_schur_step_banded): O(F K)
    per LM iteration instead of O(F^2 K), same semantics — requires the
    odometry edges to form a chain (odo_j == odo_i + 1), which
    build_slam_graph guarantees.  Returns (poses_cw [F,7],
    objects [K,10], chi2 scalar).
    """
    F = g.poses_cw.shape[0]

    # frame 0 fixed (Optimizer.cpp:138); masked frames also fixed
    free_frame = g.frame_mask & (jnp.arange(F) > 0)
    free_obj = g.obj_mask

    def step(carry, _):
        poses, objects, lam, nu, chi2 = carry
        if banded:
            D, Bb, bp, Hoo, bo, U = build_normal_equations_banded(
                poses, objects, g, K_mat, normal)
            dx_p, dx_o, lam0 = solve_schur_step_banded(
                D, Bb, bp, Hoo, bo, U, lam, free_frame, free_obj, cg_iters)
        else:
            Hpp, bp, Hoo, bo, U = build_normal_equations(poses, objects, g,
                                                         K_mat, normal)
            dx_p, dx_o, lam0 = solve_schur_step(Hpp, bp, Hoo, bo, U, lam,
                                                free_frame, free_obj,
                                                cg_iters)
        poses_new, objects_new = apply_updates(poses, objects, dx_p, dx_o)
        chi2_new = _chi2(poses_new, objects_new, g, K_mat, normal)

        accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
        lam_next = jnp.where(accept, lam0 / 3.0, lam0 * nu)
        nu_next = jnp.where(accept, 2.0, nu * 2.0)
        poses = jnp.where(accept, poses_new, poses)
        objects = jnp.where(accept, objects_new, objects)
        chi2 = jnp.where(accept, chi2_new, chi2)
        return (poses, objects, lam_next, nu_next, chi2), None

    chi2_0 = _chi2(g.poses_cw, g.objects, g, K_mat, normal)
    init = (g.poses_cw, g.objects, jnp.float32(-1.0), jnp.float32(2.0),
            chi2_0)
    (poses, objects, _, _, chi2), _ = jax.lax.scan(step, init, None,
                                                   length=cfg.iters)
    return poses, objects, chi2


def _inv6(H):
    eye = jnp.eye(6, dtype=H.dtype)
    return jax.vmap(lambda col: chol_solve_small(H, col))(eye).T
