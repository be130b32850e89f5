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


def optimize_slam_sharded(g: sb.SlamGraph, K_mat, normal, mesh: Mesh,
                          cfg: LMConfig = LMConfig(), cg_iters: int = 64):
    """Distributed SLAM-mode BA over an edge-sharded mesh.

    Only the O(E) work — per-edge residuals/jacobians and their
    segment-sum assembly — runs inside ``shard_map`` (+psum); the
    replicated Schur/PCG solve stays outside, so XLA's SPMD partitioner
    never sees the dense [F,6,F,6] einsums (partitioning the full LM
    loop blew compile time up by >40x on the CPU backend).  Returns
    (poses_cw, objects, chi2), matching ``backend.slam_ba.optimize_slam``
    on the same (padded) graph up to f32 reduction order.
    """
    n_dev = mesh.shape[AXIS]
    g = pad_graph_edges(g, n_dev)
    F = g.poses_cw.shape[0]

    rep = P()
    sh = P(AXIS)
    edge_specs = (sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, rep)

    def build_body(poses, objects, e2f, e2o, e2b, e2w, e3f, e3o, e3m, e3w,
                   oi, oj, om, ow, gw):
        gl = g._replace(e2_frame=e2f, e2_obj=e2o, e2_bbox=e2b, e2_w=e2w,
                        e3_frame=e3f, e3_obj=e3o, e3_meas=e3m, e3_w=e3w,
                        odo_i=oi, odo_j=oj, odo_meas=om, odo_w=ow,
                        grav_w=jnp.where(jax.lax.axis_index(AXIS) == 0,
                                         gw, 0.0))
        parts = sb.build_normal_equations(poses, objects, gl, K_mat, normal)
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
                              out_specs=(rep,) * 6)
    chi2_sharded = shard_map(chi2_body, mesh=mesh,
                             in_specs=(rep, rep) + edge_specs,
                             out_specs=rep)

    free_frame = g.frame_mask & (jnp.arange(F) > 0)
    free_obj = g.obj_mask

    @jax.jit
    def run(poses0, objects0):
        def step(carry, _):
            poses, objects, lam, nu, chi2 = carry
            Hpp, bp, Hoo, bo, U, _ = build_sharded(poses, objects,
                                                   *edge_args)
            dx_p, dx_o, lam0 = sb.solve_schur_step(
                Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj, cg_iters)
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
