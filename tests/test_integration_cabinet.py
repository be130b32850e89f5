"""End-to-end integration on the bundled 58-frame TUM fr3_cabinet sequence.

Minimum slice (reference run with EllipsoidExtraction off): manual
association from the detection files, SVD initialization after 15
observations, 2D projection-edge LM every frame -- exercising
L7 -> L5 -> L4 -> L0 like ``Example/interface/rgbd.cpp``.
"""
import os

import numpy as np
import pytest

from object_oriented_slam_tpu.io import TUMDataset
from object_oriented_slam_tpu.system import System

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(CABINET),
                                reason="cabinet dataset unavailable")]


@pytest.fixture(scope="module")
def cabinet_run(tmp_path_factory):
    ds = TUMDataset(CABINET)
    slam = System(YAML)
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det, depth=None, rgb=None,
                                with_association=True)
    slam.tracker.sync()
    return slam


def test_objects_initialized(cabinet_run):
    objs = cabinet_run.map_objects
    # the cabinet sequence tracks a single instance (id 0) of label 28
    assert 0 in objs
    rec = cabinet_run.tracker.state.objects[0]
    assert rec.label == 28
    assert len(rec.obs2d_bbox) > 15


def test_object_geometry_sane(cabinet_run):
    vec10 = cabinet_run.map_objects[0]
    center = vec10[:3]
    scale = vec10[7:]
    # the camera trajectory orbits the cabinet; object must sit inside the
    # trajectory's convex region and have furniture-scale extents
    traj = np.stack(cabinet_run.tracker.state.frames_pose_wc)[:, :3]
    assert np.linalg.norm(center[:2] - traj[:, :2].mean(0)) < 2.0
    assert np.all(scale > 0.05) and np.all(scale < 2.0)
    # reprojection consistency: projected bbox should overlap measured bbox
    import jax.numpy as jnp
    from object_oriented_slam_tpu.core import ellipsoid as ell, se3
    rec = cabinet_run.tracker.state.objects[0]
    K = jnp.asarray(cabinet_run.tracker.K.astype(np.float32))
    ious = []
    for pose_cw, bbox in zip(rec.obs2d_pose_cw, rec.obs2d_bbox):
        proj = np.asarray(ell.project_bbox(
            jnp.asarray(vec10.astype(np.float32)),
            jnp.asarray(pose_cw.astype(np.float32)), K))
        valid = bbox >= 5
        if valid.sum() < 4:
            continue
        ix1, iy1 = max(proj[0], bbox[0]), max(proj[1], bbox[1])
        ix2, iy2 = min(proj[2], bbox[2]), min(proj[3], bbox[3])
        inter = max(0, ix2 - ix1) * max(0, iy2 - iy1)
        a1 = (proj[2] - proj[0]) * (proj[3] - proj[1])
        a2 = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
        ious.append(inter / (a1 + a2 - inter))
    assert len(ious) > 10
    assert np.mean(ious) > 0.5, np.mean(ious)


def test_output_files(cabinet_run, tmp_path):
    objp = str(tmp_path / "objects.txt")
    hisp = str(tmp_path / "object_history.txt")
    cabinet_run.save_objects_to_file(objp)
    cabinet_run.save_object_history(hisp)
    from object_oriented_slam_tpu.io.writers import load_objects
    inst, vecs = load_objects(objp)
    assert inst == [0]
    assert vecs.shape == (1, 10)
    with open(hisp) as f:
        first = f.readline().strip()
    assert first == "1"
