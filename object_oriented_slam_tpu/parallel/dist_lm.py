"""Observation-sharded distributed bundle adjustment.

The reference has no distributed backend (SURVEY.md section 2.7); this module
*introduces* one, TPU-first: the observation axis -- the axis that actually
grows with trajectory length (the reference rebuilds an O(total_observations)
graph every frame, Optimizer.cpp:106-139) -- is sharded across a
``jax.sharding.Mesh``, each device builds the Gauss-Newton normal equations
for its shard of 2D/3D edges, and the per-landmark 9x9 blocks are reduced
with ``psum`` over ICI.  The tiny replicated 9x9 solves then apply the same
LM accept/reject schedule as the single-chip backend, so single- and
multi-chip paths produce the same iterates up to f32 psum-order round-off.

Shard-local math uses the SoA layout of ``backend/lm_soa.py`` (observation
axis in lanes) — the same 2.4-5x TPU win as the single-chip default.

This is the Schur-complement structure specialized to mapping mode: with
poses fixed, the reduced system IS the block-diagonal landmark system, so
"marginalization" degenerates to independent 9x9 solves after the psum
reduction.  SLAM mode (free poses, odometry chain) adds the off-diagonal
pose-landmark coupling; see backend/slam_ba.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..backend.lm import LMConfig, ObjectObservations, _TAU
from ..backend import lm_soa as soa

AXIS = "obs"


def _sharded_body(est0, obj_mask, p2, b2, pr2, m2, p3, me3, pr3, m3,
                  K, normal, gravity_active, cfg: LMConfig):
    """Runs on each device over its observation shard (inside shard_map)."""
    O = est0.shape[0]
    prep = soa.soa_prepare(p2, b2, p3, me3)

    # ---- weights; counts need a global reduction --------------------------
    n2d = jax.lax.psum(jnp.sum(m2, axis=1), AXIS)          # [O]
    gate2d = n2d >= cfg.min_2d_obs
    w2d = jnp.sqrt(jnp.maximum(pr2, 0.0))
    w2d = jnp.where(m2 & gate2d[:, None], w2d, 0.0)
    w3d = jnp.sqrt(jnp.maximum(pr3, 0.0) * cfg.scale_3d)
    w3d = jnp.where(m3, w3d, 0.0)

    # gravity edge lives on shard 0 only (exactly one edge per object)
    on_shard0 = jax.lax.axis_index(AXIS) == 0
    wg = jnp.broadcast_to(jnp.where(gravity_active & on_shard0,
                                    jnp.float32(cfg.gravity_scale), 0.0),
                          (O,)).astype(est0.dtype)

    # ---- NaN gate at initial estimates (Optimizer.cpp:234-243) ------------
    w2d = jnp.where(soa.soa_finite2d(est0, prep[0], prep[1], prep[2], K),
                    w2d, 0.0)
    # optional visibility gate (Optimizer.cpp:35-81, off by default)
    if cfg.check_visibility:
        w2d = jnp.where(soa.soa_visibility2d(est0, prep[0], prep[1], K,
                                             cfg.vis_rows, cfg.vis_cols),
                        w2d, 0.0)

    hd = cfg.huber_delta

    def global_chi2(est):
        return jax.lax.psum(
            soa.soa_chi2_chunked(est, prep, w2d, w3d, wg, normal, K, hd),
            AXIS)

    def step(carry, _):
        est, lam, nu, chi2 = carry
        H_l, g_l, _ = soa.soa_normal_eq_chunked(est, prep, w2d, w3d, wg,
                                                normal, K, hd)
        H = jax.lax.psum(H_l, AXIS)                      # [O, 9, 9]
        g = jax.lax.psum(g_l, AXIS)                      # [O, 9]

        diag_max = jnp.max(jnp.abs(jnp.diagonal(H, axis1=1, axis2=2)), axis=1)
        lam0 = jnp.where(lam < 0, _TAU * diag_max, lam)
        lam0 = jnp.maximum(lam0, 1e-12)

        A = H + lam0[:, None, None] * jnp.eye(9, dtype=H.dtype)
        from ..ops.linalg import chol_solve_small
        du = -chol_solve_small(A, g)
        du = jnp.where(jnp.all(jnp.isfinite(du), axis=1, keepdims=True),
                       du, 0.0)

        est_new = soa.soa_exp_update_flat(est, du)
        chi2_new = global_chi2(est_new)

        denom = jnp.einsum("oi,oi->o", du, lam0[:, None] * du - g)
        rho = (chi2 - chi2_new) / jnp.where(jnp.abs(denom) > 1e-20,
                                            denom, 1e-20)
        accept = (chi2_new < chi2) & jnp.isfinite(chi2_new)
        factor = jnp.clip(1.0 - (2.0 * rho - 1.0) ** 3, 1.0 / 3.0, 2.0 / 3.0)
        lam_next = jnp.where(accept, lam0 * factor, lam0 * nu)
        nu_next = jnp.where(accept, 2.0, nu * 2.0)
        est_next = jnp.where(accept[:, None], est_new, est)
        chi2_next = jnp.where(accept, chi2_new, chi2)
        return (est_next, lam_next, nu_next, chi2_next), None

    O = est0.shape[0]
    chi2_0 = global_chi2(est0)
    init = (est0, jnp.full((O,), -1.0, jnp.float32),
            jnp.full((O,), 2.0, jnp.float32), chi2_0)
    (est_f, _, _, chi2_f), _ = jax.lax.scan(step, init, None, length=cfg.iters)

    # objects with no edges anywhere keep their initial estimate
    has_edges = (jax.lax.psum(jnp.sum(w2d, axis=1) + jnp.sum(w3d, axis=1),
                              AXIS)) > 0
    est_out = jnp.where((obj_mask & has_edges)[:, None], est_f, est0)
    return est_out, chi2_f


def optimize_objects_sharded(obs: ObjectObservations, K, normal,
                             ground_set, mesh: Mesh,
                             cfg: LMConfig = LMConfig()):
    """Distributed mapping-mode BA over an observation-sharded mesh.

    Observation buffers are partitioned along their M axis across
    ``mesh[AXIS]``; estimates and outputs are replicated.
    """
    gravity_active = jnp.logical_and(jnp.asarray(ground_set),
                                     jnp.asarray(cfg.gravity_on))

    obs_spec = P(None, AXIS)          # [O, M] arrays
    obs_spec3 = P(None, AXIS, None)   # [O, M, k] arrays
    rep = P()

    fn = shard_map(
        functools.partial(_sharded_body, cfg=cfg),
        mesh=mesh,
        in_specs=(rep, rep, obs_spec3, obs_spec3, obs_spec, obs_spec,
                  obs_spec3, obs_spec3, obs_spec, obs_spec, rep, rep, rep),
        out_specs=(rep, rep),
    )
    return fn(obs.est0, obs.obj_mask, obs.pose2d_cw, obs.bbox2d, obs.prob2d,
              obs.mask2d, obs.pose3d_wc, obs.meas3d, obs.prob3d, obs.mask3d,
              K, normal, gravity_active)
