"""Observation ring-window behavior past the per-object capacity.

The reference backend rebuilds the graph over ALL observations ever seen
(src/core/Optimizer.cpp:106-139, unbounded).  Here the per-object buffers
are fixed-capacity rings (tracking.py MAX_OBS2D=512): once an object
exceeds 512 2D observations, the oldest are overwritten and the per-frame
LM optimizes the most recent 512.  This is a documented deviation
(PARITY.md); these tests bound it by running a sequence past the wrap and
measuring the gap to the full-graph f64 optimum.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,
                                                   make_scene)
from object_oriented_slam_tpu.system import System

N_FRAMES = 560  # > MAX_OBS2D=512 observations for the single object


@pytest.fixture(scope="module")
def wrapped_run(tmp_path_factory):
    yaml = tmp_path_factory.mktemp("cfg") / "settings.yaml"
    scene = make_scene(n_objects=1, seed=5)
    cam = scene.camera
    yaml.write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
        f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
        f"Camera.scale: {cam.scale}\n"
        "Tracking.KeyFrameCheck.Close: 1\n")  # store every observation

    ds = SyntheticDataset(scene, n_frames=N_FRAMES, seed=2)
    slam = System(str(yaml))
    all_obs = []  # (pose_cw is derived in the tracker; keep pose_wc+bbox)
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det)
        if len(det):
            all_obs.append((pose.copy(), det[0, 1:5].copy(), det[0, 6]))
    slam.tracker.sync()
    return slam, scene, all_obs


def test_ring_actually_wrapped(wrapped_run):
    slam, _, all_obs = wrapped_run
    t = slam.tracker
    assert len(all_obs) > t.MAX_OBS2D, "scene must overflow the window"
    assert int(t._b_n2[0]) == len(all_obs)          # total appended
    # buffer holds the most recent MAX_OBS2D observations: the slot the
    # (k mod cap) pointer wrote last must equal the last observation
    last_i = (len(all_obs) - 1) % t.MAX_OBS2D
    np.testing.assert_allclose(t._b_b2[0, last_i],
                               all_obs[-1][1].astype(np.float32), atol=1e-5)


def test_windowed_estimate_matches_full_graph(wrapped_run):
    """The windowed online estimate must sit at (near) the f64 full-graph
    optimum: the dropped oldest observations are redundant views of the
    same object, so the window solution stays inside test tolerance.
    Measured drift is recorded in PARITY.md."""
    import bench  # repo-root f64 replica of the reference backend

    slam, scene, all_obs = wrapped_run
    est = slam.map_objects[0]

    # full-graph f64 LM over ALL observations, warm-started from the
    # windowed estimate: if the windowed answer were biased, the full
    # graph would pull it away by more than the tolerance
    poses_cw = []
    bboxes = []
    probs = []
    for pose_wc, bbox, prob in all_obs:
        T = bench.np_se3_mat(pose_wc)
        Ti = np.linalg.inv(T)
        R, t = Ti[:3, :3], Ti[:3, 3]
        q = bench._mat_to_quat(R)
        poses_cw.append(np.concatenate([t, q]))
        bboxes.append(bbox)
        probs.append(prob)
    obs2d = [(p, b, pr) for p, b, pr in zip(poses_cw, bboxes, probs)]
    full = bench.numpy_backend_frame(est.copy(), obs2d, [], None,
                                     scene.camera.K, iters=20)

    drift_center = np.linalg.norm(full[:3] - est[:3])
    drift_scale = np.max(np.abs(full[7:] - est[7:]))
    print(f"ring-window drift: center {drift_center*1000:.2f} mm, "
          f"scale {drift_scale*1000:.2f} mm")
    assert drift_center < 0.01    # < 1 cm against the unbounded graph
    assert drift_scale < 0.01

    # and both sit near the ground truth object
    gt = scene.ellipsoids[0]
    assert np.linalg.norm(est[:3] - gt[:3]) < 0.05
    assert np.max(np.abs(np.sort(est[7:]) - np.sort(gt[7:]))) < 0.06
