"""Symmetry estimation tests on analytically mirrored clouds."""
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core import plane as pl
from object_oriented_slam_tpu.core import se3
from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import symmetry as sym

RNG = np.random.default_rng(11)
CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)


def make_symmetric_cloud(n=150, plane_angle=0.0, plane_dis=0.0):
    """Cloud symmetric about the plane fromDisAngle(dis, angle)."""
    half = RNG.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    # keep points on one side of the plane
    pi = np.asarray(pl.from_dis_angle(jnp.float32(plane_dis),
                                      jnp.float32(plane_angle)))
    side = half @ pi[:3] + pi[3]
    half = half[side > 0.02][:n // 2]
    mirrored = np.asarray(pl.mirror_points(jnp.asarray(pi),
                                           jnp.asarray(half)))
    cloud = np.concatenate([half, mirrored]).astype(np.float32)
    return cloud, pi


def pad_cloud(cloud, cap=256):
    pts = np.zeros((cap, 3), np.float32)
    m = np.zeros(cap, bool)
    n = min(len(cloud), cap)
    pts[:n] = cloud[:n]
    m[:n] = True
    return jnp.asarray(pts), jnp.asarray(m)


def far_camera():
    """Camera far away so no mirrored point lands in the bbox (all points
    'observable', cost = pure NN distance)."""
    # camera at z=-50 in the object frame looking +z
    return jnp.asarray(np.array([0, 0, -50, 0, 0, 0, 1], np.float32))


def test_cost_zero_for_true_plane():
    cloud, pi = make_symmetric_cloud()
    pts, m = pad_cloud(cloud)
    proj_depth = jnp.zeros((480, 640))
    bbox = jnp.asarray(np.array([0.0, 0, 1, 1], np.float32))  # tiny bbox
    nrm = jnp.sum(pts * pts, axis=1)
    cost_true = sym._mirror_cost(jnp.asarray(pi)[None], pts.T, nrm, m, bbox,
                                 far_camera(), proj_depth, CAM, 0.1)
    cost_off = sym._mirror_cost(
        np.asarray(pl.from_dis_angle(jnp.float32(0.15), jnp.float32(0.4)))[None],
        pts.T, nrm, m, bbox, far_camera(), proj_depth, CAM, 0.1)
    assert float(cost_true) < 0.05
    assert float(cost_off) > float(cost_true) + 0.1


def test_estimate_recovers_plane():
    cloud, pi = make_symmetric_cloud(plane_angle=0.06, plane_dis=0.08)
    pts, m = pad_cloud(cloud)
    proj_depth = jnp.zeros((480, 640))
    bbox = jnp.asarray(np.array([0.0, 0, 1, 1], np.float32))
    res = sym.estimate_symmetry(pts, m, bbox, far_camera(), proj_depth,
                                CAM, dual=False)
    got = np.asarray(res.plane)
    # compare plane up to sign
    want = pi / np.linalg.norm(pi[:3])
    gn = got / np.linalg.norm(got[:3])
    err = min(np.linalg.norm(gn - want), np.linalg.norm(gn + want))
    assert err < 0.05, (gn, want)
    assert float(res.prob) > 0.5


def test_occluded_points_cost_zero():
    # a cloud with NO symmetry, but the camera close so mirrored points fall
    # inside the bbox onto zero-depth (occluded) pixels -> cost 0
    cloud = RNG.uniform(-0.2, 0.2, (100, 3)).astype(np.float32)
    pts, m = pad_cloud(cloud, 128)
    proj_depth = jnp.zeros((480, 640))  # all occluded
    bbox = jnp.asarray(np.array([0.0, 0.0, 639.0, 479.0], np.float32))
    pose_oc = jnp.asarray(np.array([0, 0, -2.0, 0, 0, 0, 1], np.float32))
    cost = sym._mirror_cost(
        np.asarray(pl.from_dis_angle(jnp.float32(0.3), jnp.float32(0.5)))[None],
        pts.T, jnp.sum(pts * pts, axis=1), m, bbox, pose_oc, proj_depth,
        CAM, 0.1)
    assert float(cost) < 1e-6


def test_complete_cloud_single():
    cloud, pi = make_symmetric_cloud()
    half = cloud[:len(cloud) // 2]  # only one side observed
    pts, m = pad_cloud(half, 128)
    res = sym.SymResult(plane=jnp.asarray(pi), dual_dis=jnp.float32(0.0),
                        prob=jnp.float32(1.0), error=jnp.float32(0.0))
    out, om, Tom = sym.complete_cloud(pts, m, res, dual=False)
    out, om = np.asarray(out), np.asarray(om)
    assert om.sum() == 2 * m.sum()
    # completed cloud is symmetric about x=0 in the NEW frame (plane normal
    # becomes the x axis): mean x ~ 0
    xs = out[om][:, 0]
    assert abs(xs.mean()) < 1e-3


def test_complete_cloud_dual():
    cloud = RNG.uniform(-0.1, 0.1, (60, 3)).astype(np.float32)
    pts, m = pad_cloud(cloud, 64)
    pi = np.asarray(pl.from_dis_angle(jnp.float32(0.0), jnp.float32(0.0)))
    res = sym.SymResult(plane=jnp.asarray(pi), dual_dis=jnp.float32(0.0),
                        prob=jnp.float32(1.0), error=jnp.float32(0.0))
    out, om, Tom = sym.complete_cloud(pts, m, res, dual=True)
    assert int(np.asarray(om).sum()) == 4 * int(np.asarray(m).sum())


def test_sym_type_table():
    assert list(sym.sym_type_of_labels([58, 59, 28, 99])) == [0, 1, 2, 0]
