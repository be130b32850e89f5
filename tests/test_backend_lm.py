"""Backend LM tests: synthetic convergence for 2D, 3D, gravity factors."""
import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.backend import (LMConfig, ObjectObservations,
                                              optimize_objects)
from object_oriented_slam_tpu.backend import residuals as res
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

from test_svd_init import K, look_at_pose  # reuse synthetic camera helpers

RNG = np.random.default_rng(4)

O, M2, M3 = 4, 64, 64


def empty_obs(est0, obj_mask):
    return ObjectObservations(
        est0=jnp.asarray(est0),
        obj_mask=jnp.asarray(obj_mask),
        pose2d_cw=jnp.tile(jnp.asarray(se3.se3_identity()), (O, M2, 1)),
        bbox2d=jnp.full((O, M2, 4), -1.0),
        prob2d=jnp.zeros((O, M2)),
        mask2d=jnp.zeros((O, M2), bool),
        pose3d_wc=jnp.tile(jnp.asarray(se3.se3_identity()), (O, M3, 1)),
        meas3d=jnp.tile(jnp.asarray(np.r_[np.zeros(3), [0, 0, 0, 1], np.ones(3)]
                                    .astype(np.float32)), (O, M3, 1)),
        prob3d=jnp.zeros((O, M3)),
        mask3d=jnp.zeros((O, M3), bool),
    )


def orbit_poses(center, n, radius=3.0, z=1.2):
    poses = []
    for i in range(n):
        ang = 2 * np.pi * i / n
        cam = center + np.array([radius * np.cos(ang), radius * np.sin(ang), z])
        poses.append(look_at_pose(cam, center))
    return np.stack(poses)


def test_2d_only_convergence():
    gt = np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32)
    n = 20
    poses_wc = orbit_poses(gt[:3], n)
    est0 = np.tile(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32), (O, 1))
    # perturbed start
    est0[0] = gt + np.r_[RNG.normal(0, 0.1, 3), np.zeros(4), RNG.normal(0, 0.05, 3)]
    est0[0][3:7] = [0, 0, 0, 1]
    obj_mask = np.zeros(O, bool); obj_mask[0] = True

    obs = empty_obs(est0, obj_mask)
    bboxes = np.stack([np.asarray(ell.project_bbox(
        jnp.asarray(gt), se3.se3_inv(jnp.asarray(p)), jnp.asarray(K)))
        for p in poses_wc])
    obs = obs._replace(
        pose2d_cw=obs.pose2d_cw.at[0, :n].set(
            jnp.asarray(np.stack([np.asarray(se3.se3_inv(jnp.asarray(p)))
                                  for p in poses_wc]))),
        bbox2d=obs.bbox2d.at[0, :n].set(jnp.asarray(bboxes)),
        prob2d=obs.prob2d.at[0, :n].set(1.0),
        mask2d=obs.mask2d.at[0, :n].set(True),
    )
    cfg = LMConfig(gravity_on=False)
    est, chi2 = optimize_objects(obs, jnp.asarray(K), jnp.zeros(3), False, cfg)
    out = np.asarray(est[0])
    assert np.allclose(out[:3], gt[:3], atol=0.02)
    assert np.allclose(sorted(out[7:]), sorted(gt[7:]), atol=0.03)
    assert float(chi2[0]) < 1e-2
    # untouched objects unchanged
    assert np.allclose(np.asarray(est[1]), est0[1], atol=1e-6)


def test_2d_gate_requires_three_obs():
    gt = np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32)
    poses_wc = orbit_poses(gt[:3], 2)
    est0 = np.tile(gt + np.r_[0.3, np.zeros(9)].astype(np.float32), (O, 1))
    obj_mask = np.zeros(O, bool); obj_mask[0] = True
    obs = empty_obs(est0, obj_mask)
    bboxes = np.stack([np.asarray(ell.project_bbox(
        jnp.asarray(gt), se3.se3_inv(jnp.asarray(p)), jnp.asarray(K)))
        for p in poses_wc])
    obs = obs._replace(
        pose2d_cw=obs.pose2d_cw.at[0, :2].set(
            jnp.asarray(np.stack([np.asarray(se3.se3_inv(jnp.asarray(p)))
                                  for p in poses_wc]))),
        bbox2d=obs.bbox2d.at[0, :2].set(jnp.asarray(bboxes)),
        prob2d=obs.prob2d.at[0, :2].set(1.0),
        mask2d=obs.mask2d.at[0, :2].set(True),
    )
    cfg = LMConfig(gravity_on=False)
    est, _ = optimize_objects(obs, jnp.asarray(K), jnp.zeros(3), False, cfg)
    # only 2 observations -> 2D edges gated off -> estimate unchanged
    assert np.allclose(np.asarray(est[0]), est0[0], atol=1e-6)


def test_3d_only_convergence():
    gt = np.array([0.5, 0.3, 0.4, 0, 0, 0, 1, 0.4, 0.3, 0.5], np.float32)
    n = 10
    poses_wc = orbit_poses(gt[:3], n)
    est0 = np.tile(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32), (O, 1))
    est0[0] = gt.copy(); est0[0][:3] += [0.2, -0.15, 0.1]
    obj_mask = np.zeros(O, bool); obj_mask[0] = True
    obs = empty_obs(est0, obj_mask)

    meas = np.stack([np.asarray(ell.transform_to(jnp.asarray(gt),
                                                 jnp.asarray(p)))
                     for p in poses_wc])
    obs = obs._replace(
        pose3d_wc=obs.pose3d_wc.at[0, :n].set(jnp.asarray(poses_wc)),
        meas3d=obs.meas3d.at[0, :n].set(jnp.asarray(meas)),
        prob3d=obs.prob3d.at[0, :n].set(1.0),
        mask3d=obs.mask3d.at[0, :n].set(True),
    )
    cfg = LMConfig(gravity_on=False)
    est, chi2 = optimize_objects(obs, jnp.asarray(K), jnp.zeros(3), False, cfg)
    out = np.asarray(est[0])
    assert np.allclose(out[:3], gt[:3], atol=1e-3)
    assert np.allclose(out[7:], gt[7:], atol=1e-3)


def test_gravity_prior_pulls_z_axis():
    # ellipsoid tilted 20 deg; only gravity edge active plus one weak 3d obs
    rpy = np.array([0.35, 0, 0], np.float32)
    e0 = np.asarray(ell.from_minimal(jnp.asarray(
        np.r_[[0, 0, 0.5], rpy, [0.4, 0.3, 0.2]].astype(np.float32))))
    est0 = np.tile(e0, (O, 1))
    obj_mask = np.zeros(O, bool); obj_mask[0] = True
    obs = empty_obs(est0, obj_mask)
    # one 3d obs of itself (keeps translation constrained), low weight
    obs = obs._replace(
        pose3d_wc=obs.pose3d_wc.at[0, 0].set(jnp.asarray(se3.se3_identity())),
        meas3d=obs.meas3d.at[0, 0].set(jnp.asarray(e0)),
        prob3d=obs.prob3d.at[0, 0].set(1e-6),
        mask3d=obs.mask3d.at[0, 0].set(True),
    )
    cfg = LMConfig(gravity_on=True, gravity_scale=100.0, scale_3d=10000.0)
    est, _ = optimize_objects(obs, jnp.asarray(K),
                              jnp.asarray(np.array([0, 0, 1], np.float32)),
                              True, cfg)
    out = np.asarray(est[0])
    R = np.asarray(se3.quat_to_mat(jnp.asarray(out[3:7])))
    angle = np.arccos(np.clip(R[:, 2] @ np.array([0, 0, 1.0]), -1, 1))
    assert angle < 0.1  # pulled from 0.35 rad toward upright


def test_check_visibility_gate():
    """Optional checkVisibility edge gate (Optimizer.cpp:35-81,232)."""
    from object_oriented_slam_tpu.backend import lm_soa as soa
    e0 = np.array([[0, 0, 0, 0, 0, 0, 1, 0.5, 0.3, 0.25]], np.float32)
    # four camera poses (Tcw) along the M2 axis:
    #  0: camera 3m behind origin looking +z -> visible
    #  1: camera 3m past the object (object behind camera) -> invisible
    #  2: camera at the object center (inside the quadric) -> invisible
    #  3: object 100m off-axis -> projects far outside the image
    tcw = (np.array([[0.0, 0.0, 0.0, 100.0]], np.float32),
           np.zeros((1, 4), np.float32),
           np.array([[3.0, -3.0, 0.0, 3.0]], np.float32))
    qcw = (np.zeros((1, 4), np.float32), np.zeros((1, 4), np.float32),
           np.zeros((1, 4), np.float32), np.ones((1, 4), np.float32))
    vis = np.asarray(soa.soa_visibility2d(
        jnp.asarray(e0), tuple(jnp.asarray(t) for t in tcw),
        tuple(jnp.asarray(q) for q in qcw), jnp.asarray(K), 480, 640))
    assert list(vis[0]) == [True, False, False, False]

    # end-to-end: with the gate on, all-behind-camera 2D edges drop and
    # the estimate stays at est0; with the gate off (the default,
    # matching the reference) the garbage projections move it
    gt = np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32)
    est0 = np.tile(gt, (O, 1))
    est0[0, 0] += 0.2
    obj_mask = np.zeros(O, bool)
    obj_mask[0] = True
    obs = empty_obs(est0, obj_mask)
    # camera at z=+3 looking +z: object sits behind it
    behind_cw = np.array([0, 0, -3, 0, 0, 0, 1], np.float32)
    nb = 5
    obs = obs._replace(
        pose2d_cw=obs.pose2d_cw.at[0, :nb].set(jnp.asarray(behind_cw)),
        bbox2d=obs.bbox2d.at[0, :nb].set(
            jnp.asarray(np.array([300.0, 220, 340, 260], np.float32))),
        prob2d=obs.prob2d.at[0, :nb].set(1.0),
        mask2d=obs.mask2d.at[0, :nb].set(True),
    )
    from object_oriented_slam_tpu.backend import optimize_objects_soa
    cfg_on = LMConfig(gravity_on=False, check_visibility=True)
    est_on, _ = optimize_objects_soa(obs, jnp.asarray(K), jnp.zeros(3),
                                     False, cfg_on)
    assert np.allclose(np.asarray(est_on[0]), est0[0], atol=1e-6)
    cfg_off = LMConfig(gravity_on=False)
    est_off, _ = optimize_objects_soa(obs, jnp.asarray(K), jnp.zeros(3),
                                      False, cfg_off)
    assert not np.allclose(np.asarray(est_off[0]), est0[0], atol=1e-3)
    # AoS path honors the same gate
    est_aos, _ = optimize_objects(obs, jnp.asarray(K), jnp.zeros(3),
                                  False, cfg_on)
    assert np.allclose(np.asarray(est_aos[0]), est0[0], atol=1e-6)


def test_residual_proj_invalid_coords_zero():
    e = jnp.asarray(np.array([0, 0, 4, 0, 0, 0, 1, 0.5, 0.5, 0.5], np.float32))
    meas = jnp.asarray(np.array([-1.0, 200, 400, 300], np.float32))
    r = np.asarray(res.residual_proj(e, se3.se3_identity(), jnp.asarray(K), meas))
    assert r[0] == 0.0
    assert r[1] != 0.0 or r[2] != 0.0 or r[3] != 0.0


def test_residual_odometry_zero_for_consistent():
    a = np.r_[RNG.normal(size=3), [0, 0, 0, 1]].astype(np.float32)
    b = np.r_[RNG.normal(size=3), [0, 0, 0, 1]].astype(np.float32)
    meas = se3.se3_mul(jnp.asarray(b), se3.se3_inv(jnp.asarray(a)))
    r = np.asarray(res.residual_odometry(jnp.asarray(a), jnp.asarray(b), meas))
    assert np.allclose(r, 0, atol=1e-5)
