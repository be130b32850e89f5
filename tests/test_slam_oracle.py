"""SLAM-mode reference-iterate oracle (VERDICT r3 item 6).

Compares backend/slam_ba.optimize_slam (f32, Schur/PCG, banded and
dense) against the f64 numpy replica of the reference's SLAM-mode graph
(tests/oracle_slam.py — free poses, frame 0 fixed, odometry + 2D
projection + 3D ellipsoid + gravity edges, numeric jacobians, dense
solve, identical lambda schedule).  Mapping mode has had this kind of
oracle since round 1; this closes the gap for the joint pose+object
path (Optimizer.cpp:126-158).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend.slam_ba import (SlamGraph, _chi2,
                                                      optimize_slam)
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

from oracle_slam import optimize_slam_np

F = 8
K = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1]],
             np.float64)


def _build_graph(seed=1):
    """Noisy-odometry orbit around one GT ellipsoid; all edge types."""
    rng = np.random.default_rng(seed)
    gt_obj = np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25],
                      np.float64)
    poses_cw, e2b, e3m = [], [], []
    for i in range(F):
        ang = 2 * np.pi * i / F
        t_wc = np.array([2.5 * np.cos(ang), 2.5 * np.sin(ang), 1.0])
        z = gt_obj[:3] - t_wc
        z /= np.linalg.norm(z)
        x = np.cross(np.array([0, 0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)
        q = np.asarray(se3.mat_to_quat(jnp.asarray(R.astype(np.float32))),
                       np.float64)
        p_wc = np.concatenate([t_wc, q])
        p_cw = np.asarray(se3.se3_inv(jnp.asarray(
            p_wc.astype(np.float32))), np.float64)
        poses_cw.append(p_cw)
        e2b.append(np.asarray(ell.project_bbox(
            jnp.asarray(gt_obj.astype(np.float32)),
            jnp.asarray(p_cw.astype(np.float32)),
            jnp.asarray(K.astype(np.float32))), np.float64))
        e3m.append(np.asarray(ell.transform_to(
            jnp.asarray(gt_obj.astype(np.float32)),
            jnp.asarray(p_wc.astype(np.float32))), np.float64))
    poses_cw = np.stack(poses_cw)
    # odometry from the TRUE relative motion; initial poses perturbed
    odo = np.stack([
        np.asarray(se3.se3_mul(
            jnp.asarray(poses_cw[i + 1].astype(np.float32)),
            se3.se3_inv(jnp.asarray(poses_cw[i].astype(np.float32)))),
            np.float64)
        for i in range(F - 1)])
    init_cw = poses_cw.copy()
    init_cw[1:, :3] += rng.normal(0, 0.02, (F - 1, 3))
    init_obj = gt_obj.copy()
    init_obj[:3] += rng.normal(0, 0.05, 3)
    # one partially-invalid bbox measurement exercises the >=5 skip
    # (BasicEllipsoidEdges.cpp:109)
    e2b[2][:2] = -1.0
    return poses_cw, init_cw, init_obj, e2b, e3m, odo


def test_slam_mode_matches_f64_oracle():
    poses_cw, init_cw, init_obj, e2b, e3m, odo = _build_graph()
    normal = np.array([0, 0, 1.0])
    grav_w = 0.5
    iters = 5

    # ---- f64 oracle ----
    edges = {
        "e2": [(f, 0, e2b[f], 1.0) for f in range(F)],
        "e3": [(f, 0, e3m[f], 1.0) for f in range(F)],
        "odo": [(i, i + 1, odo[i], 10.0) for i in range(F - 1)],
        "grav": [(0, normal, grav_w)],
    }
    poses_ref, objs_ref, trace = optimize_slam_np(
        init_cw, init_obj[None], edges, K, iters=iters)

    # ---- f32 production path ----
    g = SlamGraph(
        poses_cw=jnp.asarray(init_cw.astype(np.float32)),
        frame_mask=jnp.ones(F, bool),
        objects=jnp.asarray(init_obj.astype(np.float32))[None],
        obj_mask=jnp.ones(1, bool),
        e2_frame=jnp.arange(F, dtype=jnp.int32),
        e2_obj=jnp.zeros(F, jnp.int32),
        e2_bbox=jnp.asarray(np.stack(e2b).astype(np.float32)),
        e2_w=jnp.ones(F, jnp.float32),
        e3_frame=jnp.arange(F, dtype=jnp.int32),
        e3_obj=jnp.zeros(F, jnp.int32),
        e3_meas=jnp.asarray(np.stack(e3m).astype(np.float32)),
        e3_w=jnp.ones(F, jnp.float32),
        odo_i=jnp.arange(F - 1, dtype=jnp.int32),
        odo_j=jnp.arange(1, F, dtype=jnp.int32),
        odo_meas=jnp.asarray(odo.astype(np.float32)),
        odo_w=jnp.full(F - 1, 10.0, jnp.float32),
        grav_w=jnp.full(1, grav_w, jnp.float32))
    K32 = jnp.asarray(K.astype(np.float32))
    n32 = jnp.asarray(normal.astype(np.float32))

    # residual semantics: identical chi2 at iterate 0
    chi2_0 = float(_chi2(g.poses_cw, g.objects, g, K32, n32))
    np.testing.assert_allclose(chi2_0, trace[0], rtol=1e-4)

    for banded in (False, True):
        poses_f, objs_f, chi2_f = optimize_slam(
            g, K32, n32, LMConfig(iters=iters), cg_iters=64, banded=banded)
        poses_f = np.asarray(poses_f, np.float64)
        objs_f = np.asarray(objs_f, np.float64)
        # iterate agreement after `iters` LM steps (f32 vs f64; the
        # schedules are identical so divergence is pure round-off
        # unless an accept/reject flips — tolerances pin both)
        q_sign = np.sign(np.sum(poses_f[:, 3:] * poses_ref[:, 3:],
                                axis=1))[:, None]
        np.testing.assert_allclose(poses_f[:, :3], poses_ref[:, :3],
                                   atol=5e-3)
        np.testing.assert_allclose(poses_f[:, 3:] * q_sign,
                                   poses_ref[:, 3:], atol=5e-3)
        np.testing.assert_allclose(objs_f[0], objs_ref[0], atol=8e-3)
        np.testing.assert_allclose(float(chi2_f), trace[-1],
                                   rtol=0.2, atol=1e-3)
