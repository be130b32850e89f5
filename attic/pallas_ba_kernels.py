"""Pallas-fused bundle-adjustment kernels.

The jnp backend (backend/lm.py) is latency-bound: each LM iteration is a
few hundred small HLO ops, each a ~1-2us kernel launch on TPU.  These
kernels fuse the entire per-edge residual + jacobian + normal-equation
build for one (object, edge-block) tile into a single Mosaic kernel, so an
LM iteration becomes a handful of launches regardless of edge math depth.

Grid: (O objects, M/B edge blocks); the M-axis accumulates into the same
per-object output block, relying on the sequential TPU grid iteration
order (last axis innermost).

jax transforms (vmap, jacfwd) are applied at trace time inside the kernel
body, so the same differentiable residual definitions from
backend/residuals.py are reused verbatim -- no duplicated math.

Mosaic block constraints: the last two block dims must equal the array
dims or be (8, 128)-divisible, hence the [O, 1, ...] output layouts, the
trailing singleton on weights, and the unblocked (whole-array) estimate
input indexed by program_id.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...backend import residuals as res
from ...core import ellipsoid as ell
from .compat import mosaic_safe_math

EDGE_BLOCK = 128


def _residual_proj_fast(e, pose_cw, K, meas_bbox):
    """residual_proj via the transcendental-free dual-conic bbox
    (identical output for valid ellipses; see ellipsoid.project_bbox_dual)."""
    proj = ell.project_bbox_dual(e, pose_cw, K)
    return jnp.where(meas_bbox >= 5.0, proj - meas_bbox, 0.0)


def _edge2d_body(est_ref, pose_ref, bbox_ref, w_ref, K_ref,
                 H_ref, g_ref, c_ref):
    o = pl.program_id(0)
    mb = pl.program_id(1)
    est = est_ref[o]
    poses = pose_ref[0]
    bboxes = bbox_ref[0]
    w = w_ref[0, :, 0]
    K = K_ref[...]

    def rfun(u):
        e = ell.exp_update(est, u)
        r = jax.vmap(lambda p, b: _residual_proj_fast(e, p, K, b))(poses,
                                                                bboxes)
        r = r * w[:, None]
        return jnp.where(jnp.isfinite(r), r, 0.0)

    z = jnp.zeros(9, est.dtype)
    r = rfun(z)
    J = jax.jacfwd(rfun)(z)                       # [B, 4, 9]
    # outer-product + multi-axis reduce: Mosaic rejects both reshape across
    # sublane/lane and batched tpu.matmul of tiny operands
    Hb = jnp.sum(J[:, :, :, None] * J[:, :, None, :], axis=(0, 1))
    gb = jnp.sum(J * r[:, :, None], axis=(0, 1))
    cb = jnp.sum(r * r)

    @pl.when(mb == 0)
    def _():
        H_ref[0] = Hb
        g_ref[0] = gb[None, :]
        c_ref[0] = cb[None, None]

    @pl.when(mb != 0)
    def _():
        H_ref[0] += Hb
        g_ref[0] += gb[None, :]
        c_ref[0] += cb[None, None]


def _edge3d_body(est_ref, pose_ref, meas_ref, w_ref,
                 H_ref, g_ref, c_ref):
    o = pl.program_id(0)
    mb = pl.program_id(1)
    est = est_ref[o]
    poses = pose_ref[0]
    meas = meas_ref[0]
    w = w_ref[0, :, 0]

    def rfun(u):
        e = ell.exp_update(est, u)
        r = jax.vmap(lambda p, m: res.residual_3d(e, p, m))(poses, meas)
        r = r * w[:, None]
        return jnp.where(jnp.isfinite(r), r, 0.0)

    z = jnp.zeros(9, est.dtype)
    r = rfun(z)
    J = jax.jacfwd(rfun)(z)                       # [B, 9, 9]
    Hb = jnp.sum(J[:, :, :, None] * J[:, :, None, :], axis=(0, 1))
    gb = jnp.sum(J * r[:, :, None], axis=(0, 1))
    cb = jnp.sum(r * r)

    @pl.when(mb == 0)
    def _():
        H_ref[0] = Hb
        g_ref[0] = gb[None, :]
        c_ref[0] = cb[None, None]

    @pl.when(mb != 0)
    def _():
        H_ref[0] += Hb
        g_ref[0] += gb[None, :]
        c_ref[0] += cb[None, None]


def _chi2_2d_body(est_ref, pose_ref, bbox_ref, w_ref, K_ref, c_ref):
    o = pl.program_id(0)
    mb = pl.program_id(1)
    est = est_ref[o]
    K = K_ref[...]
    r = jax.vmap(lambda p, b: _residual_proj_fast(est, p, K, b))(
        pose_ref[0], bbox_ref[0]) * w_ref[0, :, 0][:, None]
    r = jnp.where(jnp.isfinite(r), r, 0.0)
    cb = jnp.sum(r * r)

    @pl.when(mb == 0)
    def _():
        c_ref[0] = cb[None, None]

    @pl.when(mb != 0)
    def _():
        c_ref[0] += cb[None, None]


def _chi2_3d_body(est_ref, pose_ref, meas_ref, w_ref, c_ref):
    o = pl.program_id(0)
    mb = pl.program_id(1)
    est = est_ref[o]
    r = jax.vmap(lambda p, m: res.residual_3d(est, p, m))(
        pose_ref[0], meas_ref[0]) * w_ref[0, :, 0][:, None]
    r = jnp.where(jnp.isfinite(r), r, 0.0)
    cb = jnp.sum(r * r)

    @pl.when(mb == 0)
    def _():
        c_ref[0] = cb[None, None]

    @pl.when(mb != 0)
    def _():
        c_ref[0] += cb[None, None]


def _edge_specs(feat_dims, block):
    """Specs for est (whole array) + [O, M, fd] edge arrays."""
    specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]  # est, unblocked
    for fd in feat_dims:
        specs.append(pl.BlockSpec(
            (1, block, fd), lambda o, m: (o, m, 0),
            memory_space=pltpu.VMEM))
    return specs


def _neq_out_specs():
    return (
        pl.BlockSpec((1, 9, 9), lambda o, m: (o, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 9), lambda o, m: (o, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda o, m: (o, 0, 0),
                     memory_space=pltpu.VMEM),
    )


def _neq_out_shape(O):
    return (
        jax.ShapeDtypeStruct((O, 9, 9), jnp.float32),
        jax.ShapeDtypeStruct((O, 1, 9), jnp.float32),
        jax.ShapeDtypeStruct((O, 1, 1), jnp.float32),
    )


def edge2d_normal_eq(est, poses, bboxes, w, K, interpret=False,
                     block=EDGE_BLOCK):
    """[O,10],[O,M,7],[O,M,4],[O,M],K -> (H [O,9,9], g [O,9], chi2 [O])."""
    O, M = w.shape
    nblk = max(1, (M + block - 1) // block)
    specs = _edge_specs([7, 4, 1], block)
    specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # K whole
    with mosaic_safe_math():
        H, g, c = pl.pallas_call(
            _edge2d_body,
            grid=(O, nblk),
            in_specs=specs,
            out_specs=_neq_out_specs(),
            out_shape=_neq_out_shape(O),
            interpret=interpret,
        )(est, poses, bboxes, w[..., None], K)
    return H, g[:, 0], c[:, 0, 0]


def edge3d_normal_eq(est, poses, meas, w, interpret=False,
                     block=EDGE_BLOCK):
    O, M = w.shape
    nblk = max(1, (M + block - 1) // block)
    specs = _edge_specs([7, 10, 1], block)
    with mosaic_safe_math():
        H, g, c = pl.pallas_call(
            _edge3d_body,
            grid=(O, nblk),
            in_specs=specs,
            out_specs=_neq_out_specs(),
            out_shape=_neq_out_shape(O),
            interpret=interpret,
        )(est, poses, meas, w[..., None])
    return H, g[:, 0], c[:, 0, 0]


def edge2d_chi2(est, poses, bboxes, w, K, interpret=False,
                block=EDGE_BLOCK):
    O, M = w.shape
    nblk = max(1, (M + block - 1) // block)
    specs = _edge_specs([7, 4, 1], block)
    specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    with mosaic_safe_math():
        c = pl.pallas_call(
            _chi2_2d_body,
            grid=(O, nblk),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 1, 1), lambda o, m: (o, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1, 1), jnp.float32),
            interpret=interpret,
        )(est, poses, bboxes, w[..., None], K)
    return c[:, 0, 0]


def edge3d_chi2(est, poses, meas, w, interpret=False, block=EDGE_BLOCK):
    O, M = w.shape
    nblk = max(1, (M + block - 1) // block)
    specs = _edge_specs([7, 10, 1], block)
    with mosaic_safe_math():
        c = pl.pallas_call(
            _chi2_3d_body,
            grid=(O, nblk),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, 1, 1), lambda o, m: (o, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1, 1), jnp.float32),
            interpret=interpret,
        )(est, poses, meas, w[..., None])
    return c[:, 0, 0]
