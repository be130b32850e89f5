"""SLAM-mode BA tests: joint pose + object recovery on synthetic graphs."""
import jax.numpy as jnp
import numpy as np
import pytest

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

from test_svd_init import K as K_np, look_at_pose

RNG = np.random.default_rng(13)


def build_graph(F=12, K=2, pose_noise=0.05):
    """Ground-truth orbiting trajectory + K objects; initial poses perturbed,
    exact odometry between consecutive gt poses, exact 3D and 2D object
    observations from every frame."""
    gt_objects = np.stack([
        np.array([0.3, 0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32),
        np.array([-0.5, 0.7, 0.3, 0, 0, 0, 1, 0.3, 0.2, 0.4], np.float32),
    ])[:K]
    center = gt_objects[:, :3].mean(0)
    gt_wc = np.stack([look_at_pose(
        center + np.array([3 * np.cos(2 * np.pi * i / F),
                           3 * np.sin(2 * np.pi * i / F), 1.0]), center)
        for i in range(F)])
    gt_cw = np.stack([np.asarray(se3.se3_inv(jnp.asarray(p))) for p in gt_wc])

    # initial poses: gt perturbed (frame 0 exact)
    init_cw = gt_cw.copy()
    for i in range(1, F):
        u = RNG.normal(0, pose_noise, 6).astype(np.float32)
        init_cw[i] = np.asarray(se3.se3_mul(se3.se3_exp(jnp.asarray(u)),
                                            jnp.asarray(gt_cw[i])))

    # odometry measurements from gt
    odo_i = np.arange(F - 1, dtype=np.int32)
    odo_j = odo_i + 1
    odo_meas = np.stack([np.asarray(se3.se3_mul(
        jnp.asarray(gt_cw[j]), se3.se3_inv(jnp.asarray(gt_cw[i]))))
        for i, j in zip(odo_i, odo_j)])

    # 2D + 3D edges from every frame to every object
    e2_f, e2_o, e2_b = [], [], []
    e3_f, e3_o, e3_m = [], [], []
    for i in range(F):
        for k in range(K):
            bb = np.asarray(ell.project_bbox(jnp.asarray(gt_objects[k]),
                                             jnp.asarray(gt_cw[i]),
                                             jnp.asarray(K_np)))
            e2_f.append(i); e2_o.append(k); e2_b.append(bb)
            meas = np.asarray(ell.transform_to(jnp.asarray(gt_objects[k]),
                                               jnp.asarray(gt_wc[i])))
            e3_f.append(i); e3_o.append(k); e3_m.append(meas)

    # initial objects: gt perturbed
    init_obj = gt_objects.copy()
    init_obj[:, :3] += RNG.normal(0, 0.1, (K, 3)).astype(np.float32)

    g = slam_ba.SlamGraph(
        poses_cw=jnp.asarray(init_cw.astype(np.float32)),
        frame_mask=jnp.ones(F, bool),
        objects=jnp.asarray(init_obj.astype(np.float32)),
        obj_mask=jnp.ones(K, bool),
        e2_frame=jnp.asarray(np.array(e2_f, np.int32)),
        e2_obj=jnp.asarray(np.array(e2_o, np.int32)),
        e2_bbox=jnp.asarray(np.stack(e2_b).astype(np.float32)),
        e2_w=jnp.ones(len(e2_f)),
        e3_frame=jnp.asarray(np.array(e3_f, np.int32)),
        e3_obj=jnp.asarray(np.array(e3_o, np.int32)),
        e3_meas=jnp.asarray(np.stack(e3_m).astype(np.float32)),
        e3_w=jnp.full(len(e3_f), 10.0),
        odo_i=jnp.asarray(odo_i),
        odo_j=jnp.asarray(odo_j),
        odo_meas=jnp.asarray(odo_meas.astype(np.float32)),
        odo_w=jnp.ones(F - 1),
        grav_w=jnp.zeros(K),
    )
    return g, gt_cw, gt_objects


@pytest.mark.slow  # ~2 min XLA:CPU compile; quick-tier SLAM coverage
# lives in tests/test_slam_quick.py
def test_slam_ba_recovers_poses_and_objects():
    g, gt_cw, gt_obj = build_graph()
    poses, objects, chi2 = slam_ba.optimize_slam(
        g, jnp.asarray(K_np), jnp.zeros(3), LMConfig(iters=10))
    poses, objects = np.asarray(poses), np.asarray(objects)
    # pose translation error must shrink well below the injected noise
    t_err = np.linalg.norm(poses[:, :3] - gt_cw[:, :3], axis=1)
    assert t_err.max() < 0.02, t_err
    o_err = np.linalg.norm(objects[:, :3] - gt_obj[:, :3], axis=1)
    assert o_err.max() < 0.02, o_err
    assert float(chi2) < 1e-1


@pytest.mark.slow
def test_slam_ba_frame0_fixed():
    g, gt_cw, _ = build_graph()
    poses, _, _ = slam_ba.optimize_slam(
        g, jnp.asarray(K_np), jnp.zeros(3), LMConfig(iters=5))
    # gauge frame untouched
    assert np.allclose(np.asarray(poses)[0], np.asarray(g.poses_cw)[0],
                       atol=1e-7)
