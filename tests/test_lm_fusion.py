"""LM fusion: the due frame's global-BA LM rides the next frame's
extraction program (Tracking.fuse_lm, frontend._combined_ext_lm).

Program count per frame drops from 2 (extraction + LM) to 1; results must
be identical to the standalone-dispatch path — same math, same batches,
same warm-start chaining, only the dispatch vehicle differs.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_extractor)
from object_oriented_slam_tpu.io.synthetic import SyntheticDataset, make_scene
from object_oriented_slam_tpu.system import System


def _yaml(tmp_path, cam):
    p = tmp_path / "s.yaml"
    p.write_text("%YAML:1.0\n"
                 f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
                 f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
                 f"Camera.scale: {cam.scale}\n")
    return str(p)


@pytest.mark.parametrize("pipeline_depth", [4, 2])
def test_fused_lm_matches_standalone(tmp_path, pipeline_depth):
    scene = make_scene(n_objects=3, seed=11)
    cam = scene.camera
    yaml = _yaml(tmp_path, cam)
    frames = list(SyntheticDataset(scene, n_frames=26).frames())

    def run(fuse):
        cfg = ExtractorConfig(cluster_min_size=30, cloud_capacity=4096)
        slam = System(yaml, extractor=make_extractor(cam, cfg),
                      plane_estimator=lambda d: np.array([0, -1, 0, 1e-3]))
        slam.open_ground_plane_estimation()
        slam.tracker.fuse_lm = fuse
        slam.tracker.pipeline_depth = pipeline_depth
        for i, ts, pose, depth, rgb, det in frames:
            slam.track_with_objects(ts, pose, det, depth=depth)
        slam.tracker.sync()
        return slam

    s_off = run(False)
    s_on = run(True)
    # the same number of LM calls ran (every frame once initialized)
    assert s_on.tracker._backend_calls == s_off.tracker._backend_calls > 0
    objs_off, objs_on = s_off.map_objects, s_on.map_objects
    assert set(objs_on) == set(objs_off) and len(objs_off) >= 1
    for inst in objs_off:
        np.testing.assert_allclose(objs_on[inst], objs_off[inst],
                                   atol=1e-4)
    # histories too (drain bookkeeping must be unaffected)
    for inst in objs_off:
        h_off = s_off.tracker.state.objects[inst].history
        h_on = s_on.tracker.state.objects[inst].history
        assert len(h_on) == len(h_off)
        np.testing.assert_allclose(np.stack(h_on), np.stack(h_off),
                                   atol=1e-4)


def test_fused_split_lm_matches_mono(tmp_path):
    """'fused-split + LM fusion' (one program: phase A + phase B + LM,
    frontend._extract_fused_lm) must produce the same map as the mono
    eager path — the configuration probe-selected for low-latency
    links (system/probe.py)."""
    from object_oriented_slam_tpu.io.native_loader import native_available
    if not native_available():
        pytest.skip("native cluster library unavailable")
    from object_oriented_slam_tpu.frontend import make_fused_extractor

    scene = make_scene(n_objects=3, seed=11)
    cam = scene.camera
    yaml = _yaml(tmp_path, cam)
    frames = list(SyntheticDataset(scene, n_frames=24).frames())

    def run(fused, fuse_lm, depth_pipe):
        cfg = ExtractorConfig(cluster_min_size=30, cloud_capacity=4096)
        maker = make_fused_extractor if fused else make_extractor
        slam = System(yaml, extractor=maker(cam, cfg),
                      plane_estimator=lambda d: np.array([0, -1, 0, 1e-3]))
        slam.open_ground_plane_estimation()
        slam.tracker.fuse_lm = fuse_lm
        slam.tracker.pipeline_depth = depth_pipe
        for i, ts, pose, depth, rgb, det in frames:
            slam.track_with_objects(ts, pose, det, depth=depth)
        slam.tracker.sync()
        return slam

    s_mono = run(False, False, 1)
    s_fused = run(True, True, 4)
    assert isinstance(s_fused.tracker.extractor, object)
    objs_m, objs_f = s_mono.map_objects, s_fused.map_objects
    assert set(objs_f) == set(objs_m) and len(objs_m) >= 1
    for inst in objs_m:
        np.testing.assert_allclose(objs_f[inst], objs_m[inst], atol=1e-3)


def test_fusion_engages(tmp_path):
    """The fused path must actually be exercised (not silently falling
    back to standalone dispatch)."""
    scene = make_scene(n_objects=2, seed=3)
    cam = scene.camera
    yaml = _yaml(tmp_path, cam)
    cfg = ExtractorConfig(cluster_min_size=30, cloud_capacity=4096)
    slam = System(yaml, extractor=make_extractor(cam, cfg),
                  plane_estimator=lambda d: np.array([0, -1, 0, 1e-3]))
    slam.open_ground_plane_estimation()
    slam.tracker.fuse_lm = True
    calls = {"fused": 0}
    orig = slam.tracker.extractor.dispatch_with_lm

    def spy(*a, **k):
        calls["fused"] += 1
        return orig(*a, **k)

    slam.tracker.extractor.dispatch_with_lm = spy
    for i, ts, pose, depth, rgb, det in SyntheticDataset(
            scene, n_frames=26).frames():
        slam.track_with_objects(ts, pose, det, depth=depth)
    slam.tracker.sync()
    assert calls["fused"] > 5
    assert slam.tracker._backend_calls > calls["fused"] - 1
