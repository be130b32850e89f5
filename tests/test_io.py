import os

import numpy as np
import pytest

from object_oriented_slam_tpu.io import Config, TUMDataset, writers
from object_oriented_slam_tpu.utils import calibrate_measurement, calibrate_measurement_np

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

needs_dataset = pytest.mark.skipif(not os.path.exists(CABINET),
                                   reason="cabinet dataset unavailable")


@pytest.mark.skipif(not os.path.exists(YAML), reason="yaml unavailable")
def test_config_yaml():
    cfg = Config(YAML)
    assert cfg.get_float("Camera.fx") == pytest.approx(535.4)
    assert cfg.get_float("Camera.scale") == pytest.approx(5000.0)
    assert cfg.get_int("Tracking.KeyFrameCheck.Close") == 1
    assert cfg.get("Dataset.Type") == "TUM"
    # missing keys read as 0 like cv::FileStorage
    assert cfg.get_float("Visualization.Builder.Open") == 0.0
    # read_value prefers programmatic values, seeds defaults
    assert cfg.read_value("Tracking_MINIMUM_INITIALIZATION_FRAME") == 15
    cfg.set_value("Foo", 3.5)
    assert cfg.read_value("Foo") == 3.5


@needs_dataset
def test_cabinet_loader():
    ds = TUMDataset(CABINET)
    assert ds.total == 58
    frames = list(ds.frames())
    assert len(frames) == 58
    i, ts, pose, depth, rgb, det = frames[0]
    assert depth.dtype == np.uint16 and depth.shape == (480, 640)
    assert rgb.shape == (480, 640, 3)
    assert pose.shape == (7,)
    # first gt row of groundtruth.txt
    assert np.allclose(pose, [-2.5508, 0.9872, 1.1019,
                              -0.4871, 0.7673, -0.3519, 0.2239])
    assert det.shape[1] == 8
    assert det.shape[0] >= 1
    # depth is metric-sane under TUM scale 5000
    z = depth[depth > 0] / 5000.0
    assert 0.3 < np.median(z) < 6.0


def test_calibrate_measurement_matches_reference_semantics():
    rows, cols, border = 480, 640, 10
    # interior box: untouched
    m = np.array([100.0, 100, 200, 200])
    out, is_border = calibrate_measurement_np(m, rows, cols, border, 0)
    assert not is_border and np.allclose(out, m)
    # touching left border: x1 invalidated
    m = np.array([5.0, 100, 200, 200])
    out, is_border = calibrate_measurement_np(m, rows, cols, border, 0)
    assert is_border and out[0] == -1 and out[2] == 200
    # too small box rejected
    m = np.array([100.0, 100, 104, 200])
    out, is_border = calibrate_measurement_np(m, rows, cols, border, 5)
    assert is_border and np.all(out == -1)

    # jnp batched version agrees
    import jax.numpy as jnp
    ms = np.array([[100.0, 100, 200, 200], [5.0, 100, 200, 200],
                   [100, 100, 104, 200]], np.float32)
    cal, isb = calibrate_measurement(jnp.asarray(ms), rows, cols, border, 5)
    assert list(np.asarray(isb)) == [False, True, True]
    assert np.allclose(np.asarray(cal)[0], ms[0])
    assert np.asarray(cal)[1, 0] == -1


def test_writers_roundtrip(tmp_path):
    p = str(tmp_path / "objects.txt")
    vec10s = np.arange(20, dtype=np.float64).reshape(2, 10)
    writers.save_objects(p, [3, 7], vec10s)
    inst, vecs = writers.load_objects(p)
    assert inst == [3, 7]
    assert np.allclose(vecs, vec10s)


def test_set_odometry_gt_alignment(tmp_path):
    """set_odometry aligns the first odometry pose to groundtruth
    (io.cpp:327-418 calibratePose): a globally offset copy of the GT
    trajectory must map back onto GT after calibration."""
    import os
    cabinet = "/root/reference/Example/dataset/cabinet/"
    if not os.path.exists(cabinet):
        import pytest
        pytest.skip("cabinet dataset unavailable")
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.io.tum import _se3_mul_np

    ds = TUMDataset(cabinet)
    # global SE3 offset: translation + yawish rotation quaternion
    off = np.array([0.3, -0.2, 0.5, 0.0, 0.0, 0.247404, 0.968912])
    lines = []
    gt_poses = {}
    for i in range(ds.total):
        p = ds.pose_for(i)
        if p is None:
            continue
        ts = ds.rgb_stamps[i]
        gt_poses[i] = p.copy()
        q = _se3_mul_np(off, p)
        lines.append(" ".join([ts] + [f"{v:.9f}" for v in q]))
    odom_file = tmp_path / "odom.txt"
    odom_file.write_text("\n".join(lines) + "\n")

    assert ds.set_odometry(str(odom_file))
    for i, gt in list(gt_poses.items())[:10]:
        p = ds.pose_for(i)
        assert p is not None
        # GT file stores 4 decimals; recovery is file-precision bound
        assert np.allclose(p[:3], gt[:3], atol=1e-3), (p, gt)
        # quaternion sign-invariant comparison
        assert min(np.linalg.norm(p[3:] - gt[3:]),
                   np.linalg.norm(p[3:] + gt[3:])) < 1e-3
