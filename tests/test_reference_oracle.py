"""Executable parity witness: TPU extraction vs the f64 reference oracle.

oracle_frontend.py re-implements EstimateLocalEllipsoid + symmetry
directly from the C++ sources; these tests run BOTH it and the TPU
pipeline on the same real cabinet frame and assert the outputs agree.
This replaces code-reading as the evidence that the batched TPU frontend
computes what the reference computes.

Tolerances are pinned by the round-3 full-sequence sweep
(examples/oracle_sweep.py; BENCH_DETAILS.md): no-symmetry center delta
is 3 mm median / 5 cm max over all 51 frames; the symmetry variants add
analytic-vs-numeric LM iterate drift bounded at ~0.04 m p90 with
probability agreement to ~0.01.  The single-frame asserts below use the
sweep's max-frame bounds with margin.
"""
import math
import os

import dataclasses
import jax.numpy as jnp
import numpy as np
import pytest

import oracle_frontend as orc
from object_oriented_slam_tpu.core import plane as plane_mod
from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_plane_estimator)
from object_oriented_slam_tpu.frontend.extractor import _extract_packed
from object_oriented_slam_tpu.io import TUMDataset

CABINET = "/root/reference/Example/dataset/cabinet/"
CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(CABINET),
                                reason="cabinet dataset unavailable")]


def _cabinet_frame(k=20):
    ds = TUMDataset(CABINET)
    for i, ts, pose, depth, rgb, det in ds.frames():
        if i >= k and len(det):
            return pose, depth, det
    raise AssertionError("no frame with detections found")


def _ground_plane(depth, pose):
    est = make_plane_estimator(CAM)
    plane_cam = est(depth)
    assert plane_cam is not None
    return np.asarray(plane_mod.transform(
        jnp.asarray(np.asarray(plane_cam, np.float32)),
        jnp.asarray(pose.astype(np.float32))), np.float64)


def _pipeline_extract(depth, bbox, pose, plane_w, sym_type):
    cfg = ExtractorConfig(open_symmetry=sym_type > 0)
    pad = 1
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:4] = bbox
    flat[pad * 4] = 1.0
    flat[pad * 5] = sym_type
    flat[pad * 6:pad * 6 + 7] = pose
    flat[pad * 6 + 7:] = plane_w
    out = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), CAM, cfg, pad,
        sym_type == 1, sym_type == 2), np.float64)[0]
    return out[:10], out[10], out[11] > 0.5


def _quat_axes(vec10):
    R = orc.quat_to_mat(vec10[3:7])
    return R[:, 0], R[:, 1], R[:, 2]


def _assert_close(e_tpu, e_orc, tol_c, tol_s, tol_z_deg):
    np.testing.assert_allclose(e_tpu[:3], e_orc[:3], atol=tol_c,
                               err_msg="center")
    # the normalized-frame x/y axes may differ by a 90-deg yaw between
    # implementations only in the dual-symmetry case; compare {sx, sy}
    # as a multiset and sz directly
    np.testing.assert_allclose(sorted(e_tpu[7:9]), sorted(e_orc[7:9]),
                               atol=tol_s, err_msg="xy scale")
    assert abs(e_tpu[9] - e_orc[9]) < tol_s, "z scale"
    _, _, z_t = _quat_axes(e_tpu)
    _, _, z_o = _quat_axes(e_orc)
    ang = math.degrees(math.acos(np.clip(abs(z_t @ z_o), -1, 1)))
    assert ang < tol_z_deg, f"z axis differs by {ang:.2f} deg"


def test_oracle_ground_plane():
    """TPU ground-plane estimator vs the f64 PCL-replica oracle
    (PlaneExtractor::extractGroundPlane, PlaneExtractor.cpp:126-183):
    same output contract — dominant gravity-consistent plane, camera on
    the positive side — within tight normal/distance tolerances."""
    ds = TUMDataset(CABINET)
    _, _, pose, depth, _, _ = next(iter(ds.frames()))
    plane_orc = orc.extract_ground_plane_oracle(depth.astype(np.int64), CAM)
    assert plane_orc is not None

    est = make_plane_estimator(CAM)
    plane_tpu = np.asarray(est(depth), np.float64)

    n_o = plane_orc[:3] / np.linalg.norm(plane_orc[:3])
    n_t = plane_tpu[:3] / np.linalg.norm(plane_tpu[:3])
    ang = math.degrees(math.acos(np.clip(n_o @ n_t, -1, 1)))
    assert ang < 3.0, f"normal angle {ang:.2f} deg"
    d_o = plane_orc[3] / np.linalg.norm(plane_orc[:3])
    d_t = plane_tpu[3] / np.linalg.norm(plane_tpu[:3])
    assert abs(d_o - d_t) < 0.05, (d_o, d_t)


def test_oracle_no_symmetry():
    pose, depth, det = _cabinet_frame()
    bbox = det[0, 1:5]
    plane_w = _ground_plane(depth, pose)

    res = orc.estimate_local_ellipsoid(depth.astype(np.int64), bbox, 28,
                                       pose, CAM, plane_w,
                                       open_symmetry=False)
    assert res.ok
    e_tpu, prob, valid = _pipeline_extract(depth, bbox, pose, plane_w, 0)
    assert valid and prob == 1.0 and res.prob == 1.0
    _assert_close(e_tpu, res.e_local, tol_c=0.02, tol_s=0.02, tol_z_deg=2.0)


def test_oracle_dual_symmetry():
    pose, depth, det = _cabinet_frame()
    bbox = det[0, 1:5]
    plane_w = _ground_plane(depth, pose)

    res = orc.estimate_local_ellipsoid(depth.astype(np.int64), bbox, 28,
                                       pose, CAM, plane_w,
                                       open_symmetry=True)
    assert res.ok
    e_tpu, prob, valid = _pipeline_extract(depth, bbox, pose, plane_w, 2)
    assert valid
    _assert_close(e_tpu, res.e_local, tol_c=0.05, tol_s=0.05, tol_z_deg=1.0)
    assert abs(prob - res.prob) < 0.05, (prob, res.prob)


def test_oracle_single_reflection():
    """Force the single-reflection prior (label as if 'laptop') so the
    VertexPlane 2-DoF path is exercised too."""
    pose, depth, det = _cabinet_frame()
    bbox = det[0, 1:5]
    plane_w = _ground_plane(depth, pose)

    res = orc.estimate_local_ellipsoid(depth.astype(np.int64), bbox, 63,
                                       pose, CAM, plane_w,
                                       open_symmetry=True)
    assert res.ok
    e_tpu, prob, valid = _pipeline_extract(depth, bbox, pose, plane_w, 1)
    assert valid
    _assert_close(e_tpu, res.e_local, tol_c=0.05, tol_s=0.05, tol_z_deg=1.0)
    assert abs(prob - res.prob) < 0.05, (prob, res.prob)
