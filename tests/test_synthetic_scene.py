"""Synthetic multi-object scenes: renderer correctness + many-object e2e.

The reference ships no evaluation data beyond the 58-frame cabinet demo;
these tests use io/synthetic.py's analytically rendered scenes to
exercise many-object capacity and score the recovered map against the
true quadrics (SURVEY.md section 4 "Implication for the new framework").
"""
import pytest

pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp

from object_oriented_slam_tpu.io.synthetic import (
    SyntheticDataset, make_scene, orbit_trajectory, render_depth,
    project_bboxes)
from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.system import System

CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
             width=640, height=480)
YAML = "/root/reference/Example/param/TUM3.yaml"


def test_render_depth_sphere_exact():
    # unit-ish sphere straight ahead: depth at the center pixel is
    # distance-to-surface along +z
    e = np.zeros((1, 10))
    e[0] = [0, 0, 1.0, 0, 0, 0, 1, 0.3, 0.3, 0.3]
    # camera at origin looking +z in world (identity rotation maps camera
    # z onto world z)
    pose = np.array([0, 0, -1.0, 0, 0, 0, 1.0])
    depth = np.asarray(render_depth(jnp.asarray(e, jnp.float32),
                                    jnp.asarray(pose, jnp.float32), CAM,
                                    plane_z=-5.0))
    d_center = depth[int(CAM.cy), int(CAM.cx)] / CAM.scale
    assert abs(d_center - 1.7) < 2e-3          # 2.0 - 0.3
    # off-object pixel sees the far plane or nothing
    assert depth[0, 0] == 0 or depth[0, 0] / CAM.scale > 3.0


def test_projected_bboxes_contain_depth_hits():
    scene = make_scene(n_objects=6, seed=3, camera=CAM)
    pose = orbit_trajectory(8, 3.2, 1.4)[0]
    depth = np.asarray(render_depth(jnp.asarray(scene.ellipsoids, jnp.float32),
                                    jnp.asarray(pose, jnp.float32), CAM))
    bbs, vis = project_bboxes(jnp.asarray(scene.ellipsoids, jnp.float32),
                              jnp.asarray(pose, jnp.float32), CAM)
    bbs, vis = np.asarray(bbs), np.asarray(vis)
    assert vis.any()
    # depth inside each visible bbox must contain an object surface closer
    # than the ground plane
    for k in np.where(vis)[0]:
        x1, y1, x2, y2 = bbs[k].astype(int)
        if x2 - x1 < 8 or y2 - y1 < 8:
            continue
        patch = depth[y1:y2, x1:x2].astype(np.float64) / CAM.scale
        assert (patch[patch > 0].size > 0)


def test_many_object_2d_pipeline():
    """12 objects, 2D-only SVD path (no depth), manual association."""
    scene = make_scene(n_objects=12, seed=7, camera=CAM)
    ds = SyntheticDataset(scene, n_frames=36, orbit_radius=3.4, height=1.6)
    slam = System(YAML)
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det)   # depth None: 2D-only
    objs = slam.map_objects
    assert len(objs) >= 7, f"only {len(objs)} of 12 initialized"
    errs = []
    for inst, v in objs.items():
        gt = scene.ellipsoids[inst]
        errs.append(np.linalg.norm(v[:3] - gt[:3]))
    errs = np.asarray(errs)
    # SVD init + projection-only LM recovers centers to decimeter level
    assert np.median(errs) < 0.25, errs


def test_depth_pipeline_over_extractor_capacity():
    """Frames with more detections than the extractor's detection-axis
    capacity must not crash: the overflow detections keep their 2D
    observations (tracking masks their extraction invalid)."""
    from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                   make_extractor,
                                                   make_plane_estimator)
    scene = make_scene(n_objects=12, seed=5, camera=CAM)
    ds = SyntheticDataset(scene, n_frames=6, orbit_radius=3.6, height=1.8)
    frames = list(ds.frames())
    max_det = max(f[5].shape[0] for f in frames)
    assert max_det > 1
    slam = System(YAML,
                  extractor=make_extractor(CAM, ExtractorConfig(
                      cluster_min_size=30, cloud_capacity=2048)),
                  plane_estimator=make_plane_estimator(CAM))
    slam.open_ground_plane_estimation()
    # force the tiny 2-slot capacity path so n_det > capacity is exercised
    # on every multi-detection frame regardless of scene visibility
    import object_oriented_slam_tpu.frontend.extractor as ext_mod
    orig = slam.tracker.extractor

    def capped(depth_u16, bboxes, labels, pose_wc, ground_plane):
        return orig(depth_u16[:, :], bboxes[:2], labels[:2], pose_wc,
                    ground_plane)

    slam.tracker.extractor = capped
    for i, ts, pose, depth, rgb, det in frames:
        slam.track_with_objects(ts, pose, det, depth=depth)
    slam.tracker.sync()
    # every observed instance still accumulated 2D observations
    recs = slam.tracker.state.objects
    assert any(len(r.obs2d_bbox) > 0 for r in recs.values())
