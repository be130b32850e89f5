"""Batched Levenberg-Marquardt backend (mapping mode).

TPU-native replacement for the reference's per-frame global graph
optimization (``/root/reference/src/core/Optimizer.cpp:83-317``).  In
mapping mode the camera poses are fixed (Optimizer.cpp:126,136), so the
factor graph decomposes exactly into independent 9-DoF problems, one per
object landmark.  The entire "global BA" therefore becomes ONE vmapped
LM solve over the object axis -- a perfect TPU mapping: every step is a
fixed-shape batched pipeline of conic projections (VPU/MXU) and 9x9
linear solves, traced once and compiled once, instead of g2o's
per-edge virtual calls and numeric jacobians.

Edge semantics replicated from Optimizer.cpp:
  * 2D edges only active when the object has > 2 observations (:201);
    info = I4 * detection probability (:219-223); edges whose initial
    residual is non-finite are dropped for the run (NaN check, :234-243).
  * 3D edges: info = I9 * prob * Scale_3dedge (:269-274, with
    inv_sigma = sqrt(prob), info = prob * scale).
  * gravity prior per object when the ground plane is set: info =
    (1 * GravityPriorScale)^2 (:183-196).
  * LM: 10 iterations, lambda_init = tau * max diag(H) with tau = 1e-5,
    accept/reject with g2o's rho-based lambda schedule
    (g2o/core/optimization_algorithm_levenberg.cpp).

The per-object update uses the same oplus as the reference's
``VertexEllipsoid``: right-multiplicative SE3 exp + additive scale
(BasicEllipsoidEdges.cpp:8-11).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import ellipsoid as ell
from . import residuals as res

_TAU = 1e-5  # g2o OptimizationAlgorithmLevenberg initial lambda factor


class ObjectObservations(NamedTuple):
    """Fixed-capacity per-object observation buffers (padded + masked).

    Shapes (O objects, M2 2d-observations, M3 3d-observations):
      est0      [O, 10]  initial ellipsoid estimates (vec10)
      obj_mask  [O]      which object slots are live
      pose2d_cw [O, M2, 7] camera Tcw per 2d obs
      bbox2d    [O, M2, 4] measured bbox (border coords = -1)
      prob2d    [O, M2]
      mask2d    [O, M2]
      pose3d_wc [O, M3, 7] camera Twc per 3d obs
      meas3d    [O, M3, 10] measured local ellipsoid (vec10)
      prob3d    [O, M3]
      mask3d    [O, M3]
    """
    est0: jnp.ndarray
    obj_mask: jnp.ndarray
    pose2d_cw: jnp.ndarray
    bbox2d: jnp.ndarray
    prob2d: jnp.ndarray
    mask2d: jnp.ndarray
    pose3d_wc: jnp.ndarray
    meas3d: jnp.ndarray
    prob3d: jnp.ndarray
    mask3d: jnp.ndarray


class LMConfig(NamedTuple):
    scale_3d: float = 10000.0        # Optimizer.Edges.3DEllipsoid.Scale
    gravity_scale: float = 100.0     # Optimizer.Edges.GravityPrior.Scale
    gravity_on: bool = True          # Optimizer.Edges.GravityPrior.Open
    iters: int = 10                  # Optimizer.cpp:291
    min_2d_obs: int = 3              # "> 2 observations" gate (:201)
    huber_delta: float = 0.0         # >0 enables the Huber kernel the
                                     # reference keeps disabled
                                     # (Optimizer.cpp:224)
    check_visibility: bool = False   # the optional 2D-edge visibility
                                     # gate, disabled by default like
                                     # Optimizer.cpp:232 ('c1')
    vis_rows: int = 480              # image size for the in-image test
    vis_cols: int = 640              # (Optimizer.cpp:20-27)


def _huber_weight(r_edge: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS sqrt-weight of the Huber kernel per edge row.

    g2o RobustKernelHuber: rho(s) = s for s <= delta^2, else
    2*delta*sqrt(s) - delta^2; the residual reweight is sqrt(rho'(s)).
    Frozen with stop_gradient (standard IRLS) so jacobians use the
    current-iterate weights.
    """
    s = jnp.sum(r_edge * r_edge, axis=-1)
    w = jnp.where(s > delta * delta,
                  jnp.sqrt(delta / jnp.maximum(jnp.sqrt(s), 1e-12)), 1.0)
    return jax.lax.stop_gradient(w)


def _weighted_residual(e: jnp.ndarray, obs: ObjectObservations, o_idx,
                       K: jnp.ndarray, normal: jnp.ndarray,
                       w2d: jnp.ndarray, w3d: jnp.ndarray, wg: jnp.ndarray,
                       pre3d=None, huber_delta: float = 0.0):
    """Stacked sqrt-info-weighted residual for a single object.

    The weights already fold in edge masks (zero weight = inactive edge),
    so this function stays fully dense and differentiable.
    """
    r2 = jax.vmap(lambda p, b: res.residual_proj(e, p, K, b))(
        obs.pose2d_cw[o_idx], obs.bbox2d[o_idx])            # [M2, 4]
    r3 = jax.vmap(res.residual_3d_pre, in_axes=(None, 0, 0))(
        e, pre3d[0], pre3d[1])                              # [M3, 9]
    rg = res.residual_gravity(e, normal)                    # [1]
    r2 = r2 * w2d[:, None]
    r3 = r3 * w3d[:, None]
    if huber_delta > 0.0:
        r2 = r2 * _huber_weight(r2, huber_delta)[:, None]
        r3 = r3 * _huber_weight(r3, huber_delta)[:, None]
    r = jnp.concatenate([
        r2.reshape(-1),
        r3.reshape(-1),
        rg * wg,
    ])
    return jnp.where(jnp.isfinite(r), r, 0.0)


def _solve_object(e0, obs: ObjectObservations, o_idx, K, normal,
                  cfg: LMConfig, gravity_active):
    """Run the LM loop for one object; returns (estimate, final chi2)."""
    # --- edge weights (sqrt info), with gating --------------------------
    n2d = jnp.sum(obs.mask2d[o_idx])
    gate2d = n2d >= cfg.min_2d_obs
    w2d = jnp.sqrt(jnp.maximum(obs.prob2d[o_idx], 0.0))
    w2d = jnp.where(obs.mask2d[o_idx] & gate2d, w2d, 0.0)

    w3d = jnp.sqrt(jnp.maximum(obs.prob3d[o_idx], 0.0) * cfg.scale_3d)
    w3d = jnp.where(obs.mask3d[o_idx], w3d, 0.0)

    wg = jnp.where(gravity_active, jnp.float32(cfg.gravity_scale), 0.0)
    wg = jnp.asarray(wg)[None] if wg.ndim == 0 else wg

    # --- NaN gate at the initial estimate (Optimizer.cpp:234-243) -------
    r2_init = jax.vmap(lambda p, b: res.residual_proj(e0, p, K, b))(
        obs.pose2d_cw[o_idx], obs.bbox2d[o_idx])
    finite2d = jnp.all(jnp.isfinite(r2_init), axis=1)
    w2d = jnp.where(finite2d, w2d, 0.0)

    # --- optional visibility gate (Optimizer.cpp:35-81, off by default) -
    if cfg.check_visibility:
        from . import lm_soa as _soa  # local import: lm_soa imports lm
        p2 = obs.pose2d_cw[o_idx][None]                    # [1, M2, 7]
        vis = _soa.soa_visibility2d(
            e0[None], tuple(p2[:, :, k] for k in range(3)),
            tuple(p2[:, :, 3 + k] for k in range(4)), K,
            cfg.vis_rows, cfg.vis_cols)[0]
        w2d = jnp.where(vis, w2d, 0.0)

    # hoist estimate-independent 3D-measurement work out of the LM loop
    pre3d = jax.vmap(res.precompute_3d_measurement)(
        obs.pose3d_wc[o_idx], obs.meas3d[o_idx])

    def rfun(u, e):
        return _weighted_residual(ell.exp_update(e, u), obs, o_idx, K,
                                  normal, w2d, w3d, wg, pre3d,
                                  cfg.huber_delta)

    def chi2_of(e):
        r = rfun(jnp.zeros(9, e0.dtype), e)
        return jnp.sum(r * r)

    def step(carry, _):
        e, lam, nu, chi2 = carry
        # linearize: one primal eval + cheap linear tangent maps (jacfwd
        # would re-run the nonlinear primal alongside the tangents)
        r, lin = jax.linearize(
            lambda u: rfun(u, e), jnp.zeros(9, e0.dtype))
        J = jax.vmap(lin)(jnp.eye(9, dtype=e0.dtype)).T      # [R, 9]
        H = J.T @ J
        g = J.T @ r
        lam0 = jnp.where(lam < 0, _TAU * jnp.max(jnp.diag(H)), lam)
        lam0 = jnp.maximum(lam0, 1e-12)

        A = H + lam0 * jnp.eye(9, dtype=H.dtype)
        from ..ops.linalg import chol_solve_small
        du = -chol_solve_small(A, g)
        du = jnp.where(jnp.all(jnp.isfinite(du)), du, jnp.zeros_like(du))

        e_new = ell.exp_update(e, du)
        chi2_new = chi2_of(e_new)
        # rho denominator: du^T (lam du - g)  (g2o levenberg: scaleFactor)
        denom = jnp.dot(du, lam0 * du - g)
        rho = (chi2 - chi2_new) / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)

        accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
        factor = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, 2.0 / 3.0)
        lam_next = jnp.where(accept, lam0 * factor, lam0 * nu)
        nu_next = jnp.where(accept, 2.0, nu * 2.0)
        e_next = jnp.where(accept, e_new, e)
        chi2_next = jnp.where(accept, chi2_new, chi2)
        return (e_next, lam_next, nu_next, chi2_next), None

    chi2_0 = chi2_of(e0)
    init = (e0, jnp.float32(-1.0), jnp.float32(2.0), chi2_0)
    (e_fin, _, _, chi2_fin), _ = jax.lax.scan(step, init, None,
                                              length=cfg.iters)

    has_edges = (jnp.sum(w2d) + jnp.sum(w3d)) > 0
    e_out = jnp.where(obs.obj_mask[o_idx] & has_edges, e_fin, e0)
    return e_out, chi2_fin


def optimize_objects(obs: ObjectObservations, K: jnp.ndarray,
                     ground_normal: jnp.ndarray, ground_set,
                     cfg: LMConfig = LMConfig()):
    """Global object-graph optimization, mapping mode.

    Replicates ``Optimizer::GlobalObjectGraphOptimization``
    (Optimizer.cpp:83-317) for fixed camera poses: all objects are solved
    in parallel (vmap over the object axis).  Returns (estimates [O,10],
    chi2 [O]).
    """
    gravity_active = jnp.logical_and(jnp.asarray(ground_set),
                                     jnp.asarray(cfg.gravity_on))
    o_indices = jnp.arange(obs.est0.shape[0])

    def solve_one(o_idx):
        return _solve_object(obs.est0[o_idx], obs, o_idx, K, ground_normal,
                             cfg, gravity_active)

    return jax.vmap(solve_one)(o_indices)


optimize_objects_jit = jax.jit(optimize_objects,
                               static_argnames=("cfg",))
