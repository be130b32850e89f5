"""The depth-N frame pipeline must not change results.

The pipeline (system/tracking.py: extraction deferral + on-device
backend warm-start chaining + lazy drains) is pure scheduling: the same
per-frame processing order (obs -> init -> backend, Tracking.cpp:170-204)
runs with the same inputs, so after sync() the maps of the eager
(pipeline_depth=1) and pipelined paths must agree to f32 noise.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_extractor,
                                               make_plane_estimator)
from object_oriented_slam_tpu.io.synthetic import SyntheticDataset, make_scene
from object_oriented_slam_tpu.system import System

CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
             width=640, height=480)
YAML = "/root/reference/Example/param/TUM3.yaml"


def _run(depth_mode: bool, pipeline_depth: int, n_frames=24):
    scene = make_scene(n_objects=4, seed=11, camera=CAM)
    ds = SyntheticDataset(scene, n_frames=n_frames, orbit_radius=3.4,
                          height=1.6)
    if depth_mode:
        slam = System(
            YAML,
            extractor=make_extractor(CAM, ExtractorConfig(
                cluster_min_size=30)),
            plane_estimator=make_plane_estimator(CAM))
        slam.open_ground_plane_estimation()
    else:
        slam = System(YAML)
    slam.tracker.pipeline_depth = pipeline_depth
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det,
                                depth=depth if depth_mode else None)
    slam.tracker.sync()
    hist = {i: np.stack(r.history) for i, r in slam.tracker.state.objects.items()
            if r.history}
    return slam.map_objects, hist


@pytest.mark.parametrize("depth_mode", [False, True])
def test_pipelined_matches_eager(depth_mode):
    objs_e, hist_e = _run(depth_mode, pipeline_depth=1)
    objs_p, hist_p = _run(depth_mode, pipeline_depth=4)
    assert set(objs_p) == set(objs_e) and len(objs_e) >= 1
    for inst in objs_e:
        assert np.allclose(objs_p[inst], objs_e[inst], atol=1e-4), \
            (inst, np.abs(objs_p[inst] - objs_e[inst]).max())
    # per-frame history rows (RefreshObjectHistory) must also agree:
    # same row count and same (n_obs, estimate) pairs
    assert set(hist_p) == set(hist_e)
    for inst in hist_e:
        assert hist_p[inst].shape == hist_e[inst].shape
        assert np.allclose(hist_p[inst], hist_e[inst], atol=1e-4), \
            np.abs(hist_p[inst] - hist_e[inst]).max()
