"""SLAM-mode on the cabinet sequence (real data).

What the joint BA guarantees (and what this test pins):
  * the pose machinery is exact -- given consistent relative odometry and
    jittered initial poses, the trajectory shape is recovered to ~mm;
  * the full graph (odometry + 2D bbox + 3D object factors) strictly
    decreases chi2 and returns finite refined poses/objects.

Note: with a single unknown object and pixel-scale projection residuals,
the maximum-likelihood trajectory legitimately deviates from ground truth
to absorb detection/model noise -- the same weighting the reference's
SLAM mode uses (identity odometry information, Optimizer.cpp:153-156);
that is why mapping-only is the reference default, and why the ATE claim
here is made on the odometry-constrained solve.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.backend.slam_ba import _chi2
from object_oriented_slam_tpu.io import TUMDataset
from object_oriented_slam_tpu.system import System
from object_oriented_slam_tpu.system.metrics import ate_rmse
from object_oriented_slam_tpu.system.slam_mode import build_slam_graph
from object_oriented_slam_tpu.system.tracking import _np_se3_inv

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(CABINET),
                                reason="cabinet dataset unavailable")]


@pytest.fixture(scope="module")
def cabinet_graph():
    rng = np.random.default_rng(17)
    ds = TUMDataset(CABINET)
    slam = System(YAML)
    gt, noisy = [], []
    for i, ts, pose, depth, rgb, det in ds.frames():
        p = pose.copy()
        p[:3] = p[:3] + rng.normal(0, 0.03, 3)  # 3 cm jitter
        gt.append(pose)
        noisy.append(p)
        slam.track_with_objects(ts, p, det)
    gt = np.stack(gt)
    noisy = np.stack(noisy)
    slam.tracker.sync()
    assert slam.tracker.state.initialized_instances()
    cfg = slam.tracker.lm_cfg._replace(gravity_on=False, iters=15)
    g, insts = build_slam_graph(slam.tracker.state, cfg, max_frames=64,
                                odometry_wc=gt, odo_weight=10.0)
    K = jnp.asarray(slam.tracker.K.astype(np.float32))
    return g, insts, gt, noisy, cfg, K


def test_odometry_constrained_shape_recovery(cabinet_graph):
    g, insts, gt, noisy, cfg, K = cabinet_graph
    g0 = g._replace(e2_w=g.e2_w * 0, e3_w=g.e3_w * 0)
    poses_cw, objects, chi2 = slam_ba.optimize_slam(g0, K, jnp.zeros(3), cfg)
    F = int(np.asarray(g.frame_mask).sum())
    pw = np.stack([_np_se3_inv(p)
                   for p in np.asarray(poses_cw, np.float64)[:F]])
    ate_in = ate_rmse(noisy[:F, :3], gt[:F, :3], align=True)
    ate_out = ate_rmse(pw[:, :3], gt[:F, :3], align=True)
    assert float(chi2) < 1e-6
    assert ate_out < 0.01 < ate_in  # mm-level shape recovery from 5cm RMS


def test_full_graph_decreases_chi2(cabinet_graph):
    g, insts, gt, noisy, cfg, K = cabinet_graph
    chi2_0 = float(_chi2(g.poses_cw, g.objects, g, K, jnp.zeros(3)))
    poses_cw, objects, chi2 = slam_ba.optimize_slam(g, K, jnp.zeros(3), cfg)
    assert float(chi2) < 0.1 * chi2_0
    assert np.all(np.isfinite(np.asarray(poses_cw)))
    assert np.all(np.isfinite(np.asarray(objects)))
    # the refined object stays at furniture scale near its mapping estimate
    obj = np.asarray(objects[0])
    assert np.all(np.abs(obj[:3]) < 5.0)
    assert np.all(obj[7:] > 0.05) and np.all(obj[7:] < 2.0)
