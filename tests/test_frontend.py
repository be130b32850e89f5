"""Frontend tests: ground plane + single-frame ellipsoid extraction on
synthetic depth scenes, plus the real cabinet first frame."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.core import se3
from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               GroundPlaneConfig,
                                               estimate_ground_plane,
                                               extract_local_ellipsoids)

CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
CABINET = "/root/reference/Example/dataset/cabinet/"


def render_scene(sphere_center=None, sphere_r=0.3, floor_y=0.8):
    """Z-buffer render of a floor plane (y = floor_y, camera looks +z with
    +y down) and optionally a sphere. Returns uint16 depth."""
    H, W = 480, 640
    jj, ii = np.meshgrid(np.arange(W), np.arange(H))
    # floor: rays r(t) = t * d, d = ((x-cx)/fx, (y-cy)/fy, 1); y = floor_y
    dy = (ii - CAM.cy) / CAM.fy
    dx = (jj - CAM.cx) / CAM.fx
    with np.errstate(divide="ignore", invalid="ignore"):
        t_floor = floor_y / dy
    z_floor = np.where((t_floor > 0.2) & (t_floor < 9.0), t_floor, 0.0)

    z = z_floor.copy()
    if sphere_center is not None:
        c = np.asarray(sphere_center)
        # ray-sphere intersection; take the nearer hit's z
        d = np.stack([dx, dy, np.ones_like(dx)], -1)
        dn = d / np.linalg.norm(d, axis=-1, keepdims=True)
        b = dn @ c
        disc = b * b - (c @ c - sphere_r ** 2)
        hit = disc > 0
        t = b - np.sqrt(np.maximum(disc, 0))
        z_sph = np.where(hit & (t > 0.2), t * dn[..., 2], 0.0)
        use = (z_sph > 0) & ((z == 0) | (z_sph < z))
        z = np.where(use, z_sph, z)
    return (z * CAM.scale).astype(np.uint16)


def test_ground_plane_synthetic():
    depth = render_scene(floor_y=0.8)
    plane, ok = estimate_ground_plane(jnp.asarray(depth.astype(np.int32)),
                                      CAM, GroundPlaneConfig())
    assert bool(ok)
    plane = np.asarray(plane)
    n = plane[:3] / np.linalg.norm(plane[:3])
    # plane is y = 0.8 -> normal +-(0,1,0), |d| = 0.8 after unit-normalization
    assert abs(abs(n[1]) - 1.0) < 0.02, plane
    d_unit = plane[3] / np.linalg.norm(plane[:3])
    assert abs(abs(d_unit) - 0.8) < 0.03
    # camera on positive side
    assert plane[3] > 0


def test_extract_sphere():
    center = np.array([0.1, 0.4, 2.0])  # below eye level, 2 m ahead
    r = 0.3
    depth = render_scene(sphere_center=center, sphere_r=r, floor_y=0.8)
    # detection bbox: project sphere -> circle
    u = CAM.fx * center[0] / center[2] + CAM.cx
    v = CAM.fy * center[1] / center[2] + CAM.cy
    rad = CAM.fx * r / np.sqrt(center[2] ** 2 - r ** 2)
    bbox = np.array([u - rad, v - rad, u + rad, v + rad], np.float32)

    pose_wc = np.array([0, 0, 0, 0, 0, 0, 1], np.float32)  # world = camera
    ground = np.array([0, -1.0, 0, 0.8], np.float32)  # y=0.8, camera positive

    cfg = ExtractorConfig(cluster_min_size=30)
    e, p, ok, _ = extract_local_ellipsoids(
        jnp.asarray(depth.astype(np.int32)),
        jnp.asarray(bbox[None]), jnp.asarray(np.array([True])),
        jnp.asarray(pose_wc), jnp.asarray(ground), CAM, cfg)
    assert bool(ok[0])
    e = np.asarray(e[0])
    # center: we only see the front surface, so the estimated center is pulled
    # toward the camera; x/y should be close, z within the sphere
    assert abs(e[0] - center[0]) < 0.1
    assert abs(e[1] - center[1]) < 0.15
    assert center[2] - r - 0.05 < e[2] < center[2] + r
    # scale: half-extents of the visible cap, <= r + slack, not degenerate
    assert np.all(np.asarray(e[7:]) > 0.03)
    assert np.all(np.asarray(e[7:]) < r + 0.15)


def test_extractor_rejects_empty_bbox():
    depth = render_scene(floor_y=0.8)  # only floor
    bbox = np.array([300.0, 100.0, 400.0, 180.0], np.float32)  # sky region
    pose_wc = np.array([0, 0, 0, 0, 0, 0, 1], np.float32)
    ground = np.array([0, -1.0, 0, 0.8], np.float32)
    e, p, ok, _ = extract_local_ellipsoids(
        jnp.asarray(depth.astype(np.int32)),
        jnp.asarray(bbox[None]), jnp.asarray(np.array([True])),
        jnp.asarray(pose_wc), jnp.asarray(ground), CAM,
        ExtractorConfig())
    assert not bool(ok[0])


@pytest.mark.skipif(not os.path.exists(CABINET), reason="dataset unavailable")
def test_ground_plane_cabinet_frame():
    import cv2
    from object_oriented_slam_tpu.io import TUMDataset
    ds = TUMDataset(CABINET)
    ts, pose, depth, rgb = ds.read_frame(0)
    plane, ok = estimate_ground_plane(jnp.asarray(depth.astype(np.int32)),
                                      CAM, GroundPlaneConfig())
    assert bool(ok)
    plane = np.asarray(plane)
    n = plane[:3] / np.linalg.norm(plane[:3])
    # gravity-consistent in camera frame (camera roughly level)
    assert abs(n[1]) > np.cos(np.deg2rad(45))
    assert plane[3] > 0
