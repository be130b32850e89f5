"""Edge-sharded distributed SLAM-mode bundle adjustment.

The reference has no distributed backend (SURVEY.md section 2.7) and its
SLAM mode is a single-threaded g2o graph (``/root/reference/src/core/
Optimizer.cpp:126-158``).  Here the *edge set* — the axis that grows with
trajectory length — is sharded across a ``jax.sharding.Mesh``: every
device computes residuals + jacobians for its slice of the 2D-projection,
3D and odometry edges, assembles partial normal equations, and the block
components (Hpp [F,6,F,6], bp, Hoo [K,9,9], bo, coupling U [F,K,6,9]) are
``psum``-reduced over ICI.  The Schur-complement reduced-camera solve then
runs replicated (identical on every device), so single- and multi-chip
paths produce identical LM iterates.

Collective payload per iteration is O(F^2*36 + K*81 + F*K*54) floats —
independent of the number of edges — which is exactly the regime where
edge-sharding scales: jacobian work is O(E/devices) while the psum stays
constant.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..backend.lm import LMConfig
from ..backend import slam_ba as sb

AXIS = "edge"


def pad_graph_edges(g: sb.SlamGraph, multiple: int) -> sb.SlamGraph:
    """Pad each edge family to a multiple of the mesh size with w=0 edges."""
    import numpy as np

    def pad_to(x, n, fill=0):
        x = np.asarray(x)
        if x.shape[0] == n:
            return x
        pad_shape = (n - x.shape[0],) + x.shape[1:]
        return np.concatenate([x, np.full(pad_shape, fill, x.dtype)])

    def rounded(n):
        return -(-max(n, 1) // multiple) * multiple

    e2 = rounded(len(np.asarray(g.e2_frame)))
    e3 = rounded(len(np.asarray(g.e3_frame)))
    eo = rounded(len(np.asarray(g.odo_i)))
    identity7 = np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32)
    me3 = np.asarray(g.e3_meas)
    me3_pad = np.tile(np.concatenate([identity7, np.ones(3, np.float32)]),
                      (e3 - me3.shape[0], 1)) if e3 > me3.shape[0] else \
        np.zeros((0, 10), np.float32)
    odo_pad = np.tile(identity7, (eo - len(np.asarray(g.odo_i)), 1)) \
        if eo > len(np.asarray(g.odo_i)) else np.zeros((0, 7), np.float32)
    return sb.SlamGraph(
        poses_cw=g.poses_cw, frame_mask=g.frame_mask,
        objects=g.objects, obj_mask=g.obj_mask,
        e2_frame=jnp.asarray(pad_to(g.e2_frame, e2)),
        e2_obj=jnp.asarray(pad_to(g.e2_obj, e2)),
        e2_bbox=jnp.asarray(pad_to(g.e2_bbox, e2, fill=-1.0)),
        e2_w=jnp.asarray(pad_to(g.e2_w, e2)),
        e3_frame=jnp.asarray(pad_to(g.e3_frame, e3)),
        e3_obj=jnp.asarray(pad_to(g.e3_obj, e3)),
        e3_meas=jnp.asarray(np.concatenate([me3, me3_pad])
                            .astype(np.float32)),
        e3_w=jnp.asarray(pad_to(g.e3_w, e3)),
        odo_i=jnp.asarray(pad_to(g.odo_i, eo)),
        odo_j=jnp.asarray(pad_to(g.odo_j, eo)),
        odo_meas=jnp.asarray(np.concatenate(
            [np.asarray(g.odo_meas).reshape(-1, 7), odo_pad])
            .astype(np.float32)),
        odo_w=jnp.asarray(pad_to(g.odo_w, eo)),
        grav_w=g.grav_w,
    )


def pad_graph_frames(g: sb.SlamGraph, multiple: int) -> sb.SlamGraph:
    """Pad the frame axis to a multiple of the mesh size with masked frames.

    Padded frames carry identity poses (valid quaternions, so SE3 ops on
    the masked lanes stay finite), ``frame_mask=False`` (the solver fixes
    them with identity rows), and no edges reference them — so the padded
    graph optimizes to the same solution as the raw one.
    """
    import numpy as np

    F = int(np.asarray(g.poses_cw).shape[0])
    Fp = -(-max(F, 1) // multiple) * multiple
    if Fp == F:
        return g
    identity7 = np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32)
    poses = np.concatenate([np.asarray(g.poses_cw),
                            np.tile(identity7, (Fp - F, 1))]).astype(
                                np.float32)
    mask = np.concatenate([np.asarray(g.frame_mask),
                           np.zeros(Fp - F, bool)])
    return g._replace(poses_cw=jnp.asarray(poses),
                      frame_mask=jnp.asarray(mask))


def solve_schur_framesharded(Hpp, bp, Hoo, bo, U, lam, free_frame,
                             free_obj, cg_iters: int, mesh: Mesh):
    """Frame-sharded Schur-complement solve of assembled normal equations.

    The reduced camera system S = Hpp - U Hoo^-1 U^T is the part of the
    SLAM-mode backend that grows with trajectory length (F frames ->
    O(F^2) matvec, O(F^2 K) Schur assembly).  Here the *rows* of S are
    sharded over the mesh: every device builds S[f_local, :, :, :] and
    its slice of the rhs, the block-Jacobi PCG runs with all state
    [F_local, 6] sharded (one [F,6] ``all_gather`` + two scalar ``psum``
    per iteration — payload independent of F per device), and the
    landmark back-substitution psum-reduces the per-device coupling
    contributions.  Math identical to ``backend.slam_ba.solve_schur_step``
    up to f32 reduction order.

    Requires bp.shape[0] % mesh.shape[AXIS] == 0 (pad_graph_frames).
    Returns (dx_p [F,6] sharded over frames, dx_o [K,9], lam0).
    """
    from ..backend.lm import _TAU

    F = bp.shape[0]
    n_dev = mesh.shape[AXIS]
    assert F % n_dev == 0, (F, n_dev)
    eye6 = jnp.eye(6)
    eye9 = jnp.eye(9)

    def body(Hpp_l, bp_l, fm_l, Hoo, bo, U, lam, fm_full, om):
        Fl = bp_l.shape[0]
        gidx = jax.lax.axis_index(AXIS) * Fl + jnp.arange(Fl)
        onehot = (gidx[:, None] == jnp.arange(F)[None, :]).astype(
            Hpp_l.dtype)                                     # [Fl,F]

        # -- damping from the global max |diagonal| -------------------
        diag_blk = jnp.einsum("figj,fg->fij", Hpp_l, onehot)  # [Fl,6,6]
        diag_pp = jnp.einsum("fii->fi", diag_blk)
        diag_oo = jnp.einsum("kii->ki", Hoo)
        maxdiag = jnp.maximum(
            jax.lax.pmax(jnp.max(jnp.abs(diag_pp)), AXIS),
            jnp.max(jnp.abs(diag_oo)))
        lam0 = jnp.where(lam < 0, _TAU * maxdiag, lam)
        lam0 = jnp.maximum(lam0, 1e-12)

        Hpp_d = Hpp_l + lam0 * jnp.einsum("fg,ij->figj", onehot, eye6)
        Hoo_d = Hoo + lam0 * eye9[None]

        # -- gauge/mask: fixed frames/objects -> identity rows --------
        Hpp_d = (Hpp_d * fm_l[:, None, None, None]
                 * fm_full[None, None, :, None]
                 + jnp.einsum("fg,ij->figj",
                              onehot * (1.0 - fm_l)[:, None], eye6))
        bp_m = bp_l * fm_l[:, None]
        Hoo_d = (Hoo_d * om[:, None, None]
                 + eye9[None] * (1.0 - om)[:, None, None])
        bo_m = bo * om[:, None]
        U_mf = U * fm_full[:, None, None, None] * om[None, :, None, None]
        U_ml = U_mf[gidx]                                    # [Fl,K,6,9]

        # -- local rows of the Schur complement -----------------------
        Minv = jax.vmap(sb._inv9)(Hoo_d)                     # [K,9,9]
        UM = jnp.einsum("fkab,kbc->fkac", U_ml, Minv)        # [Fl,K,6,9]
        S_l = Hpp_d - jnp.einsum("fkac,gkdc->fagd", UM, U_mf)
        rhs_l = -bp_m + jnp.einsum("fkac,kc->fa", UM, bo_m)

        Sdiag = jnp.einsum("figj,fg->fij", S_l, onehot)      # [Fl,6,6]
        Pinv = jax.vmap(sb._inv6)(Sdiag)

        # -- PCG, all vector state frame-sharded ----------------------
        def matvec(p_l):
            p_full = jax.lax.all_gather(p_l, AXIS, tiled=True)  # [F,6]
            return jnp.einsum("fagd,gd->fa", S_l, p_full)

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), AXIS)

        def precond(r):
            return jnp.einsum("fij,fj->fi", Pinv, r)

        x0 = jnp.zeros_like(rhs_l)
        z0 = precond(rhs_l)

        def cg_body(carry, _):
            x, r, z, p, rz = carry
            Ap = matvec(p)
            pAp = pdot(p, Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = pdot(r, z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            p = z + beta * p
            return (x, r, z, p, rz_new), None

        (dx_p, _, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs_l, z0, z0, pdot(rhs_l, z0)), None,
            length=cg_iters)

        # -- landmark back-substitution (psum over frame shards) ------
        rhs_o = bo_m + jax.lax.psum(
            jnp.einsum("fkac,fa->kc", U_ml, dx_p), AXIS)
        dx_o = -jnp.einsum("kbc,kc->kb", Minv, rhs_o)

        dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * fm_l[:, None]
        dx_o = jnp.where(jnp.isfinite(dx_o), dx_o, 0.0) * om[:, None]
        return dx_p, dx_o, lam0

    rep = P()
    sh = P(AXIS)
    fm = free_frame.astype(bp.dtype)
    om = free_obj.astype(bo.dtype)
    return shard_map(body, mesh=mesh,
                     in_specs=(sh, sh, sh, rep, rep, rep, rep, rep, rep),
                     out_specs=(sh, rep, rep))(
        Hpp, bp, fm, Hoo, bo, U, lam, fm, om)


def solve_schur_framesharded_banded(D, B, bp, Hoo, bo, U, lam, free_frame,
                                    free_obj, cg_iters: int, mesh: Mesh):
    """Frame-sharded banded + low-rank Schur solve (the DCN-aware path).

    The pose Hessian is block-tridiagonal (odometry chain) plus the
    rank-9K landmark coupling, so the PCG matvec needs only (a) one-row
    halo exchanges with the two neighbouring frame shards (``ppermute``
    of a [6]-vector each way — on a multi-host mesh with contiguous
    frame blocks per host, exactly one such pair crosses each DCN
    boundary) and (b) a [K,9] ``psum`` for the low-rank term.
    Per-iteration cross-device traffic is O(K) — independent of F —
    versus the dense path's [F,6] ``all_gather``.  U, D, B, bp are
    frame-sharded; no O(F^2) object is ever built.

    Requires bp.shape[0] % mesh.shape[AXIS] == 0 (pad_graph_frames).
    Returns (dx_p [F,6] sharded, dx_o [K,9], lam0).
    """
    from ..backend.lm import _TAU

    F = bp.shape[0]
    n_dev = mesh.shape[AXIS]
    assert F % n_dev == 0, (F, n_dev)
    eye6 = jnp.eye(6)
    eye9 = jnp.eye(9)
    fwd = [(i, i + 1) for i in range(n_dev - 1)]     # to next shard
    bwd = [(i + 1, i) for i in range(n_dev - 1)]     # to previous shard

    def send_first_back(x_l):
        """Receive the next shard's first row (zeros on the last shard)."""
        return jax.lax.ppermute(x_l[0], AXIS, bwd)

    def send_last_fwd(x_l):
        """Receive the previous shard's last row (zeros on shard 0)."""
        return jax.lax.ppermute(x_l[-1], AXIS, fwd)

    def body(D_l, B_l, bp_l, fm_l, U_l, Hoo, bo, lam, om):
        diag_pp = jnp.einsum("fii->fi", D_l)
        diag_oo = jnp.einsum("kii->ki", Hoo)
        maxdiag = jnp.maximum(jax.lax.pmax(jnp.max(jnp.abs(diag_pp)), AXIS),
                              jnp.max(jnp.abs(diag_oo)))
        lam0 = jnp.where(lam < 0, _TAU * maxdiag, lam)
        lam0 = jnp.maximum(lam0, 1e-12)

        # damping + gauge (fixed frames -> identity rows), local blocks
        D_d = D_l + lam0 * eye6[None]
        D_d = (D_d * fm_l[:, None, None]
               + eye6[None] * (1.0 - fm_l)[:, None, None])
        fm_next = jnp.concatenate([fm_l[1:], send_first_back(fm_l)[None]])
        B_d = B_l * (fm_l * fm_next)[:, None, None]
        bp_m = bp_l * fm_l[:, None]
        Hoo_d = Hoo + lam0 * eye9[None]
        Hoo_d = (Hoo_d * om[:, None, None]
                 + eye9[None] * (1.0 - om)[:, None, None])
        bo_m = bo * om[:, None]
        U_ml = U_l * fm_l[:, None, None, None] * om[None, :, None, None]

        Minv = jax.vmap(sb._inv9)(Hoo_d)             # [K,9,9] replicated
        UM_l = jnp.einsum("fkab,kbc->fkac", U_ml, Minv)
        rhs_l = -bp_m + jnp.einsum("fkac,kc->fa", UM_l, bo_m)

        Sdiag = D_d - jnp.einsum("fkac,fkdc->fad", UM_l, U_ml)
        Pinv = jax.vmap(sb._inv6)(Sdiag)

        def matvec(x_l):
            t = jax.lax.psum(jnp.einsum("gkdc,gd->kc", U_ml, x_l), AXIS)
            y = jnp.einsum("fij,fj->fi", D_d, x_l)
            x_next = jnp.concatenate([x_l[1:], send_first_back(x_l)[None]])
            y = y + jnp.einsum("fij,fj->fi", B_d, x_next)
            up = jnp.einsum("fij,fi->fj", B_d, x_l)  # B[f]^T x[f] -> f+1
            y = y + jnp.concatenate([send_last_fwd(up)[None], up[:-1]])
            return y - jnp.einsum("fkac,kc->fa", UM_l, t)

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), AXIS)

        def precond(r):
            return jnp.einsum("fij,fj->fi", Pinv, r)

        x0 = jnp.zeros_like(rhs_l)
        z0 = precond(rhs_l)

        def cg_body(carry, _):
            x, r, z, p, rz = carry
            Ap = matvec(p)
            pAp = pdot(p, Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) > 1e-20, pAp, 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_new = pdot(r, z)
            beta = rz_new / jnp.where(jnp.abs(rz) > 1e-20, rz, 1e-20)
            p = z + beta * p
            return (x, r, z, p, rz_new), None

        (dx_p, _, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs_l, z0, z0, pdot(rhs_l, z0)), None,
            length=cg_iters)

        rhs_o = bo_m + jax.lax.psum(
            jnp.einsum("fkac,fa->kc", U_ml, dx_p), AXIS)
        dx_o = -jnp.einsum("kbc,kc->kb", Minv, rhs_o)

        dx_p = jnp.where(jnp.isfinite(dx_p), dx_p, 0.0) * fm_l[:, None]
        dx_o = jnp.where(jnp.isfinite(dx_o), dx_o, 0.0) * om[:, None]
        return dx_p, dx_o, lam0

    rep = P()
    sh = P(AXIS)
    fm = free_frame.astype(bp.dtype)
    om = free_obj.astype(bo.dtype)
    return shard_map(body, mesh=mesh,
                     in_specs=(sh, sh, sh, sh, sh, rep, rep, rep, rep),
                     out_specs=(sh, rep, rep))(
        D, B, bp, fm, U, Hoo, bo, lam, om)


def optimize_slam_sharded(g: sb.SlamGraph, K_mat, normal, mesh: Mesh,
                          cfg: LMConfig = LMConfig(), cg_iters: int = 64,
                          shard_solve: bool = False, banded: bool = False):
    """Distributed SLAM-mode BA over an edge-sharded mesh.

    Only the O(E) work — per-edge residuals/jacobians and their
    segment-sum assembly — runs inside ``shard_map`` (+psum); the
    replicated Schur/PCG solve stays outside, so XLA's SPMD partitioner
    never sees the dense [F,6,F,6] einsums (partitioning the full LM
    loop blew compile time up by >40x on the CPU backend).  Returns
    (poses_cw, objects, chi2), matching ``backend.slam_ba.optimize_slam``
    on the same (padded) graph up to f32 reduction order.

    With ``shard_solve=True`` the Schur-complement reduced-camera solve
    is additionally sharded over the *frame* axis
    (``solve_schur_framesharded``): both the O(E) jacobian work and the
    O(F^2 K) reduced-system work then scale with the mesh — the regime
    for long multi-host pose graphs.

    ``banded=True`` switches assembly + solve to the block-tridiagonal +
    low-rank formulation (O(F K) compute, O(F) memory; requires
    chain odometry).  Combined with ``shard_solve=True`` this is the
    DCN-aware path: per-PCG-iteration cross-host traffic is one-row
    halos + a [K,9] psum instead of an [F,6] all_gather
    (solve_schur_framesharded_banded).
    """
    n_dev = mesh.shape[AXIS]
    g = pad_graph_edges(g, n_dev)
    if shard_solve:
        g = pad_graph_frames(g, n_dev)
    F = g.poses_cw.shape[0]

    rep = P()
    sh = P(AXIS)
    edge_specs = (sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, rep)
    build_fn = (sb.build_normal_equations_banded if banded
                else sb.build_normal_equations)
    n_parts = 6 if banded else 5

    def build_body(poses, objects, e2f, e2o, e2b, e2w, e3f, e3o, e3m, e3w,
                   oi, oj, om, ow, gw):
        gl = g._replace(e2_frame=e2f, e2_obj=e2o, e2_bbox=e2b, e2_w=e2w,
                        e3_frame=e3f, e3_obj=e3o, e3_meas=e3m, e3_w=e3w,
                        odo_i=oi, odo_j=oj, odo_meas=om, odo_w=ow,
                        grav_w=jnp.where(jax.lax.axis_index(AXIS) == 0,
                                         gw, 0.0))
        parts = build_fn(poses, objects, gl, K_mat, normal)
        chi2 = sb._chi2(poses, objects, gl, K_mat, normal)
        return tuple(jax.lax.psum(x, AXIS) for x in (*parts, chi2))

    def chi2_body(poses, objects, e2f, e2o, e2b, e2w, e3f, e3o, e3m, e3w,
                  oi, oj, om, ow, gw):
        gl = g._replace(e2_frame=e2f, e2_obj=e2o, e2_bbox=e2b, e2_w=e2w,
                        e3_frame=e3f, e3_obj=e3o, e3_meas=e3m, e3_w=e3w,
                        odo_i=oi, odo_j=oj, odo_meas=om, odo_w=ow,
                        grav_w=jnp.where(jax.lax.axis_index(AXIS) == 0,
                                         gw, 0.0))
        return jax.lax.psum(sb._chi2(poses, objects, gl, K_mat, normal),
                            AXIS)

    edge_args = (g.e2_frame, g.e2_obj, g.e2_bbox, g.e2_w,
                 g.e3_frame, g.e3_obj, g.e3_meas, g.e3_w,
                 g.odo_i, g.odo_j, g.odo_meas, g.odo_w, g.grav_w)

    build_sharded = shard_map(build_body, mesh=mesh,
                              in_specs=(rep, rep) + edge_specs,
                              out_specs=(rep,) * (n_parts + 1))
    chi2_sharded = shard_map(chi2_body, mesh=mesh,
                             in_specs=(rep, rep) + edge_specs,
                             out_specs=rep)

    free_frame = g.frame_mask & (jnp.arange(F) > 0)
    free_obj = g.obj_mask

    @jax.jit
    def run(poses0, objects0):
        def step(carry, _):
            poses, objects, lam, nu, chi2 = carry
            parts = build_sharded(poses, objects, *edge_args)
            if banded:
                D, Bb, bp, Hoo, bo, U = parts[:6]
                if shard_solve:
                    dx_p, dx_o, lam0 = solve_schur_framesharded_banded(
                        D, Bb, bp, Hoo, bo, U, lam, free_frame, free_obj,
                        cg_iters, mesh)
                else:
                    dx_p, dx_o, lam0 = sb.solve_schur_step_banded(
                        D, Bb, bp, Hoo, bo, U, lam, free_frame, free_obj,
                        cg_iters)
            elif shard_solve:
                Hpp, bp, Hoo, bo, U = parts[:5]
                dx_p, dx_o, lam0 = solve_schur_framesharded(
                    Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj,
                    cg_iters, mesh)
            else:
                Hpp, bp, Hoo, bo, U = parts[:5]
                dx_p, dx_o, lam0 = sb.solve_schur_step(
                    Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj,
                    cg_iters)
            poses_new, objects_new = sb.apply_updates(poses, objects,
                                                      dx_p, dx_o)
            chi2_new = chi2_sharded(poses_new, objects_new, *edge_args)

            accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
            lam_next = jnp.where(accept, lam0 / 3.0, lam0 * nu)
            nu_next = jnp.where(accept, 2.0, nu * 2.0)
            poses = jnp.where(accept, poses_new, poses)
            objects = jnp.where(accept, objects_new, objects)
            chi2 = jnp.where(accept, chi2_new, chi2)
            return (poses, objects, lam_next, nu_next, chi2), None

        chi2_0 = chi2_sharded(poses0, objects0, *edge_args)
        init = (poses0, objects0, jnp.float32(-1.0), jnp.float32(2.0),
                chi2_0)
        (poses, objects, _, _, chi2), _ = jax.lax.scan(
            step, init, None, length=cfg.iters)
        return poses, objects, chi2

    return run(g.poses_cw, g.objects)
