"""End-to-end automatic data association on a synthetic two-object scene.

A translating camera observes two spheres on a floor; detections carry no
instance ids (with_association=False), so the DASolver must create and
maintain two instances via gated center-distance matching
(DataAssociation.cpp semantics).
"""
import numpy as np

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_extractor,
                                               make_plane_estimator)
from object_oriented_slam_tpu.io.config import Config
from object_oriented_slam_tpu.system import Tracking

from test_frontend import CAM, render_scene


def render_two_spheres(cam_x, centers_world, r=0.25, floor_y=0.8):
    """Depth render of both spheres from a camera translated by cam_x."""
    # sequential z-buffer: render each sphere into the same image
    c0 = centers_world[0] - np.array([cam_x, 0, 0])
    c1 = centers_world[1] - np.array([cam_x, 0, 0])
    d0 = render_scene(sphere_center=c0, sphere_r=r, floor_y=floor_y)
    d1 = render_scene(sphere_center=c1, sphere_r=r, floor_y=floor_y)
    both = np.where((d1 > 0) & ((d0 == 0) | (d1 < d0)), d1, d0)
    return both


def bbox_of(center_cam, r):
    u = CAM.fx * center_cam[0] / center_cam[2] + CAM.cx
    v = CAM.fy * center_cam[1] / center_cam[2] + CAM.cy
    rad = CAM.fx * r / np.sqrt(center_cam[2] ** 2 - r ** 2)
    return np.array([u - rad, v - rad, u + rad, v + rad])


def test_two_objects_auto_association(tmp_path):
    cfg = Config.__new__(Config)
    cfg._file = {
        "Camera.fx": CAM.fx, "Camera.fy": CAM.fy, "Camera.cx": CAM.cx,
        "Camera.cy": CAM.cy, "Camera.scale": CAM.scale,
        "Camera.width": 640, "Camera.height": 480,
        "Optimizer.Edges.3DEllipsoid.Scale": 10000,
        "Optimizer.Edges.GravityPrior.Open": 1,
        "Optimizer.Edges.GravityPrior.Scale": 100,
        "Measurement.Border.Pixels": 10,
        "Measurement.LengthLimit.Pixels": 0,
        "Tracking.KeyFrameCheck.Close": 1,
    }
    cfg._values = {"Tracking_MINIMUM_INITIALIZATION_FRAME": 15.0,
                   "EllipsoidExtractor_DEPTH_RANGE": 6.0}

    r = 0.25
    centers = [np.array([-0.5, 0.4, 2.2]), np.array([0.6, 0.45, 2.6])]

    tracker = Tracking(
        cfg,
        extractor=make_extractor(CAM, ExtractorConfig(cluster_min_size=30)),
        plane_estimator=make_plane_estimator(CAM))
    tracker.open_ground_plane_estimation()

    n_frames = 6
    for i in range(n_frames):
        cam_x = 0.08 * i
        depth = render_two_spheres(cam_x, centers)
        pose_wc = np.array([cam_x, 0, 0, 0, 0, 0, 1.0])
        rows = []
        for j, c in enumerate(centers):
            bb = bbox_of(c - np.array([cam_x, 0, 0]), r)
            rows.append([j, *bb, 40 + j, 0.9, -1])  # instance col unused
        det = np.array(rows)
        tracker.grab_pose_and_objects(float(i), pose_wc, det, depth,
                                      with_association=False)

    tracker.sync()
    insts = tracker.state.initialized_instances()
    assert len(insts) == 2, insts
    # each instance accumulated one observation per frame (association
    # stayed consistent rather than spawning new instances)
    for inst in insts:
        rec = tracker.state.objects[inst]
        assert len(rec.obs3d_meas) == n_frames

    # map centers near the true world centers (world frame = camera 0)
    got = sorted([tracker.state.objects[i].vec10[:3] for i in insts],
                 key=lambda v: v[0])
    want = sorted(centers, key=lambda v: v[0])
    for g, w in zip(got, want):
        assert np.linalg.norm(np.asarray(g)[:2] - w[:2]) < 0.15, (g, w)
        assert abs(g[2] - w[2]) < r + 0.1


# ---------------------------------------------------------------------------
# Optimal (Hungarian) association upgrade
# ---------------------------------------------------------------------------

def test_hungarian_matches_bruteforce():
    from itertools import permutations
    from object_oriented_slam_tpu.assoc.association import _hungarian
    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(1, 5))
        m = int(rng.integers(n, 7))
        cost = rng.uniform(0, 10, (n, m))
        assign = _hungarian(cost)
        got = cost[np.arange(n), assign].sum()
        best = min(sum(cost[i, p[i]] for i in range(n))
                   for p in permutations(range(m), n))
        assert np.isclose(got, best, atol=1e-9), (cost, assign)
        assert len(set(assign.tolist())) == n  # one column per row


def test_optimal_association_fixes_greedy_steal():
    from object_oriented_slam_tpu.assoc import (
        InstanceCounter, associate_observations,
        associate_observations_optimal)
    map_inst = [0, 1]
    map_centers = np.array([[0.0, 0, 0], [1.5, 0, 0]])
    obs = np.array([[0.4, 0, 0], [0.05, 0, 0]])
    valid = [True, True]
    greedy = associate_observations(obs, valid, map_inst, map_centers,
                                    InstanceCounter(2))
    opt = associate_observations_optimal(obs, valid, map_inst, map_centers,
                                         InstanceCounter(2))
    # greedy row order: obs0 claims object 0, obs1 (the one actually ON
    # object 0) is forced to a new instance
    assert greedy == [0, 2]
    # optimal: obs1 takes object 0, obs0 opens the new track
    assert opt == [2, 0]


def test_optimal_association_agrees_when_unambiguous():
    from object_oriented_slam_tpu.assoc import (
        InstanceCounter, associate_observations,
        associate_observations_optimal)
    rng = np.random.default_rng(3)
    map_centers = rng.uniform(-3, 3, (6, 3))
    map_inst = list(range(6))
    obs = map_centers[[4, 1, 3]] + rng.normal(0, 0.03, (3, 3))
    valid = [True, True, True]
    g = associate_observations(obs, valid, map_inst, map_centers,
                               InstanceCounter(6))
    o = associate_observations_optimal(obs, valid, map_inst, map_centers,
                                       InstanceCounter(6))
    assert g == o == [4, 1, 3]


def test_optimal_association_invalid_and_empty_map():
    from object_oriented_slam_tpu.assoc import (
        InstanceCounter, associate_observations_optimal)
    out = associate_observations_optimal(
        np.zeros((2, 3)), [False, True], [], np.zeros((0, 3)),
        InstanceCounter(0))
    assert out == [-1, 0]
