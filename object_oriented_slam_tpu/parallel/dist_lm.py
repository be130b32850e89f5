"""Observation-sharded distributed bundle adjustment.

The reference has no distributed backend (SURVEY.md section 2.7); this module
*introduces* one, TPU-first: the observation axis -- the axis that actually
grows with trajectory length (the reference rebuilds an O(total_observations)
graph every frame, Optimizer.cpp:106-139) -- is sharded across a
``jax.sharding.Mesh``, each device builds the Gauss-Newton normal equations
for its shard of 2D/3D edges, and the per-landmark 9x9 blocks are reduced
with ``psum`` over ICI.  The tiny replicated 9x9 solves then apply the same
LM accept/reject schedule as the single-chip backend (backend/lm.py), so
single- and multi-chip paths produce identical iterates.

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

from ..backend import residuals as res
from ..backend.lm import LMConfig, ObjectObservations, _TAU
from ..core import ellipsoid as ell

AXIS = "obs"


def _object_residual(e, p2, b2, w2d, pre3d, w3d, normal, wg, K):
    r2 = jax.vmap(lambda p, b: res.residual_proj(e, p, K, b))(p2, b2)
    r3 = jax.vmap(res.residual_3d_pre, in_axes=(None, 0, 0))(
        e, pre3d[0], pre3d[1])
    rg = res.residual_gravity(e, normal)
    r = jnp.concatenate([
        (r2 * w2d[:, None]).reshape(-1),
        (r3 * w3d[:, None]).reshape(-1),
        rg * wg,
    ])
    return jnp.where(jnp.isfinite(r), r, 0.0)


def _object_normal_eq(e, p2, b2, w2d, pre3d, w3d, normal, wg, K):
    """Local-shard normal equations for one object.

    Returns (H [9,9], g [9], chi2 scalar) from this device's slice of
    observations; weights already fold masks/probabilities/gates.
    """
    def rfun(u):
        return _object_residual(ell.exp_update(e, u), p2, b2, w2d, pre3d,
                                w3d, normal, wg, K)

    z = jnp.zeros(9, e.dtype)
    r, lin = jax.linearize(rfun, z)
    J = jax.vmap(lin)(jnp.eye(9, dtype=e.dtype)).T
    return J.T @ J, J.T @ r, jnp.sum(r * r)


def _object_chi2(e, p2, b2, w2d, pre3d, w3d, normal, wg, K):
    r = _object_residual(e, p2, b2, w2d, pre3d, w3d, normal, wg, K)
    return jnp.sum(r * r)


def _sharded_body(est0, obj_mask, p2, b2, pr2, m2, p3, me3, pr3, m3,
                  K, normal, gravity_active, cfg: LMConfig):
    """Runs on each device over its observation shard (inside shard_map)."""
    # ---- weights; counts need a global reduction --------------------------
    n2d = jax.lax.psum(jnp.sum(m2, axis=1), AXIS)          # [O]
    gate2d = n2d >= cfg.min_2d_obs
    w2d = jnp.sqrt(jnp.maximum(pr2, 0.0))
    w2d = jnp.where(m2 & gate2d[:, None], w2d, 0.0)
    w3d = jnp.sqrt(jnp.maximum(pr3, 0.0) * cfg.scale_3d)
    w3d = jnp.where(m3, w3d, 0.0)

    # gravity edge lives on shard 0 only (exactly one edge per object)
    on_shard0 = jax.lax.axis_index(AXIS) == 0
    wg_scalar = jnp.where(gravity_active & on_shard0,
                          jnp.float32(cfg.gravity_scale), 0.0)
    wg = wg_scalar[None]

    # ---- NaN gate at initial estimates (Optimizer.cpp:234-243) ------------
    def nan_gate(e, p2o, b2o):
        r2 = jax.vmap(lambda p, b: res.residual_proj(e, p, K, b))(p2o, b2o)
        return jnp.all(jnp.isfinite(r2), axis=1)
    finite2d = jax.vmap(nan_gate)(est0, p2, b2)
    w2d = jnp.where(finite2d, w2d, 0.0)

    # hoist estimate-independent 3D-measurement work (per shard)
    pre3d = jax.vmap(jax.vmap(res.precompute_3d_measurement))(p3, me3)

    normal_eq = jax.vmap(lambda e, a, bb, c, d0, d1, f: _object_normal_eq(
        e, a, bb, c, (d0, d1), f, normal, wg, K))
    chi2_fn = jax.vmap(lambda e, a, bb, c, d0, d1, f: _object_chi2(
        e, a, bb, c, (d0, d1), f, normal, wg, K))

    def global_chi2(est):
        return jax.lax.psum(
            chi2_fn(est, p2, b2, w2d, pre3d[0], pre3d[1], w3d), AXIS)

    def step(carry, _):
        est, lam, nu, chi2 = carry
        H_l, g_l, _ = normal_eq(est, p2, b2, w2d, pre3d[0], pre3d[1], w3d)
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

        est_new = jax.vmap(ell.exp_update)(est, du)
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
