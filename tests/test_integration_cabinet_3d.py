"""Full 3D pipeline integration on the bundled cabinet sequence:
ground-plane estimation + single-frame ellipsoid extraction + 3D/2D/gravity
optimization (the reference demo's configuration, symmetry off)."""
import os

import numpy as np
import pytest

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_extractor,
                                               make_plane_estimator)
from object_oriented_slam_tpu.io import TUMDataset
from object_oriented_slam_tpu.system import System

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(CABINET),
                                reason="cabinet dataset unavailable")]


@pytest.fixture(scope="module")
def run3d():
    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
    ds = TUMDataset(CABINET)
    slam = System(YAML, extractor=make_extractor(cam, ExtractorConfig()),
                  plane_estimator=make_plane_estimator(cam))
    slam.open_ground_plane_estimation()
    # subset of frames keeps CI time bounded; stride 2 still gives ~25 obs
    for i, ts, pose, depth, rgb, det in ds.frames():
        if i % 2:
            continue
        slam.track_with_objects(ts, pose, det, depth=depth)
    slam.tracker.sync()
    return slam


def test_ground_plane_world_up(run3d):
    gp = run3d.tracker.state.ground_plane
    assert gp is not None
    n = gp[:3] / np.linalg.norm(gp[:3])
    # TUM world frame is z-up; the floor normal must be near +-z
    assert abs(n[2]) > 0.95, gp


def test_3d_initialized_object(run3d):
    rec = run3d.tracker.state.objects[0]
    assert rec.initialized
    assert len(rec.obs3d_meas) > 10
    v = rec.vec10
    # same place as the 2D-only slice found it, with furniture-scale extents
    assert np.all(np.abs(v[:2] - np.array([-1.53, 0.46])) < 0.3), v
    assert np.all(v[7:] > 0.1) and np.all(v[7:] < 1.0)
    # gravity prior: z-axis of the ellipsoid near the world up axis
    import jax.numpy as jnp
    from object_oriented_slam_tpu.core import se3
    R = np.asarray(se3.quat_to_mat(jnp.asarray(v[3:7].astype(np.float32))))
    gp = run3d.tracker.state.ground_plane
    n = gp[:3] / np.linalg.norm(gp[:3])
    assert abs(R[:, 2] @ n) > 0.95
