"""Config-key wiring parity: object_list dump, builder key, manual plane
check, capacity warnings.

Reference behaviors covered:
  * ``./object_list.txt`` written after every optimizer run
    (src/core/Optimizer.cpp:308-316) — here behind
    ``Optimizer.WriteObjectList.Open``.
  * ``Visualization.Builder.Open`` drives the dense builder per frame
    (src/core/Tracking.cpp:234-250).
  * ``Plane.MannualCheck.Open`` interactive ground-plane confirmation
    (src/core/Tracking.cpp:758-772) — rejection keeps the state machine
    estimating.
"""
import os

import numpy as np
import pytest

from object_oriented_slam_tpu.io.config import Config
from object_oriented_slam_tpu.system.tracking import Tracking

CABINET = "/root/reference/Example/dataset/cabinet/"
TUM3 = "/root/reference/Example/param/TUM3.yaml"


def _yaml(tmp_path, extra=""):
    p = tmp_path / "settings.yaml"
    p.write_text(
        "%YAML:1.0\n"
        "Camera.fx: 535.4\nCamera.fy: 539.2\n"
        "Camera.cx: 320.1\nCamera.cy: 247.6\n"
        "Camera.scale: 5000.0\n" + extra)
    return str(p)


def test_object_list_dump_key(tmp_path):
    """With the key on, every drained optimizer run rewrites
    object_list.txt (instance \\t vec9 \\t label rows)."""
    if not os.path.exists(CABINET):
        pytest.skip("cabinet dataset unavailable")
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.system import System

    slam = System(TUM3)
    slam.tracker.write_object_list = False  # baseline: key off (default)
    assert slam.config.get_int("Optimizer.WriteObjectList.Open") == 0

    slam = System(TUM3)
    slam.tracker.write_object_list = True
    out = str(tmp_path / "object_list.txt")
    slam.tracker.object_list_path = out
    for i, ts, pose, depth, rgb, det in list(TUMDataset(CABINET).frames())[:20]:
        slam.track_with_objects(ts, pose, det)
    slam.tracker.sync()
    assert os.path.exists(out)
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    assert len(rows) >= 1
    inst, vec9, label = rows[0]
    assert len(vec9.split()) == 9
    int(inst), int(label)


def test_builder_config_key(tmp_path):
    """Visualization.Builder.Open=1 creates and drives the dense builder
    inside Tracking."""
    cfg_on = Config(_yaml(tmp_path, "Visualization.Builder.Open: 1\n"))
    t = Tracking(cfg_on)
    assert t.dense_builder is not None

    depth = np.full((480, 640), int(2.0 * 5000.0), np.uint16)
    rgb = np.full((480, 640, 3), 100, np.uint8)
    pose = np.array([0, 0, 0, 0, 0, 0, 1], np.float64)
    t.grab_pose_and_objects(0.0, pose, np.zeros((0, 8)), depth, rgb)
    pts, _ = t.dense_builder.get_map()
    assert len(pts) > 100

    # absent key -> off (cv::FileStorage missing-key-is-0 semantics)
    t_off = Tracking(Config(_yaml(tmp_path)))
    assert t_off.dense_builder is None


def test_plane_manual_check(tmp_path):
    """Rejection keeps ground_state at 1 (retry next frame); acceptance
    latches the plane (Tracking.cpp:758-772)."""
    cfg = Config(_yaml(tmp_path, "Plane.MannualCheck.Open: 1\n"))
    answers = [False, True]
    asked = []

    def check(plane):
        asked.append(np.array(plane))
        return answers[len(asked) - 1]

    t = Tracking(cfg, plane_estimator=lambda depth: np.array([0, -1, 0, 2.0]))
    t.plane_manual_check_fn = check
    t.open_ground_plane_estimation()
    depth = np.full((480, 640), 10000, np.uint16)
    pose = np.array([0, 0, 0, 0, 0, 0, 1], np.float64)

    t.grab_pose_and_objects(0.0, pose, np.zeros((0, 8)), depth)
    assert t.state.ground_state == 1 and t.state.ground_plane is None
    t.grab_pose_and_objects(1.0, pose, np.zeros((0, 8)), depth)
    assert t.state.ground_state == 2 and t.state.ground_plane is not None
    assert len(asked) == 2

    # key off: never asked
    t2 = Tracking(Config(_yaml(tmp_path)),
                  plane_estimator=lambda depth: np.array([0, -1, 0, 2.0]))
    t2.plane_manual_check_fn = lambda plane: (_ for _ in ()).throw(
        AssertionError("must not be called"))
    t2.open_ground_plane_estimation()
    t2.grab_pose_and_objects(0.0, pose, np.zeros((0, 8)), depth)
    assert t2.state.ground_state == 2


def test_object_tier_growth(tmp_path):
    """Instances beyond the initial tier GROW the object axis (the
    reference has no instance cap, Optimizer.cpp:175-180); buffer
    contents and slot assignment survive the growth."""
    t = Tracking(Config(_yaml(tmp_path)))
    base = t.max_objects
    for inst in range(base + 1):
        t._append_obs2d(inst, np.zeros(7),
                        np.array([1.0 * inst, 0, 10 + inst, 10.0]), 1.0)
    assert t.max_objects == 2 * base
    assert t._b_views["p2"].shape[0] == 2 * base
    # every instance kept its slot and its observation
    for inst in range(base + 1):
        slot = t._slot_of[inst]
        assert t._b_n2[slot] == 1
        assert t._b_views["b2"][slot, 0, 0] == 1.0 * inst
    # second growth works too
    for inst in range(base + 1, 2 * base + 1):
        t._append_obs2d(inst, np.zeros(7), np.array([0, 0, 10, 10.0]), 1.0)
    assert t.max_objects == 4 * base
    assert t._b_views["b2"][t._slot_of[3], 0, 0] == 3.0
