"""TUM-format export of synthetic scenes: loader round-trip + pipeline.

Proves the real dataset loader (io/tum.py, including the native decoder
path) on a second sequence beyond the bundled cabinet demo
(SURVEY.md section 4 / ROADMAP multi-sequence evaluation).
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

from make_synthetic_tum import export_synthetic_tum  # noqa: E402

from object_oriented_slam_tpu.core.camera import Camera  # noqa: E402
from object_oriented_slam_tpu.io import TUMDataset  # noqa: E402
from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,  # noqa
                                                   make_scene)
from object_oriented_slam_tpu.system import System  # noqa: E402

cv2 = pytest.importorskip("cv2")

YAML = "/root/reference/Example/param/TUM3.yaml"
CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
             width=640, height=480)


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_tum"))
    scene = make_scene(n_objects=6, seed=3, camera=CAM)
    ds = SyntheticDataset(scene, n_frames=20, orbit_radius=3.4, height=1.6)
    n = export_synthetic_tum(out, scene, ds, odometry_noise=0.01)
    assert n == 20
    return out, scene, ds


def test_loader_roundtrip(seq_dir):
    out, scene, ds = seq_dir
    tum = TUMDataset(out)
    orig = list(ds.frames())
    loaded = list(tum.frames())
    assert len(loaded) == len(orig)
    for (i0, _, pose0, depth0, _, det0), (i1, _, pose1, depth1, _, det1) \
            in zip(orig, loaded):
        assert np.allclose(pose1, pose0, atol=1e-3)       # 4-decimal dump
        assert depth1.dtype == np.uint16
        assert np.array_equal(depth1,
                              np.clip(depth0, 0, 65535).astype(np.uint16))
        assert det1.shape == det0.shape
        assert np.allclose(det1, det0, atol=1e-3)
    # odometry file loads and aligns its first frame to GT
    tum.set_odometry(os.path.join(out, "odometry.txt"))
    p0 = tum.pose_for(0)
    assert np.allclose(p0, orig[0][2], atol=1e-3)


def test_pipeline_on_exported_sequence(seq_dir):
    out, scene, _ = seq_dir
    tum = TUMDataset(out)
    slam = System(YAML)
    for i, ts, pose, depth, rgb, det in tum.frames():
        slam.track_with_objects(ts, pose, det)            # 2D-only
    objs = slam.map_objects
    assert len(objs) >= 3
    errs = [np.linalg.norm(v[:3] - scene.ellipsoids[k][:3])
            for k, v in objs.items()]
    assert np.median(errs) < 0.3, errs
