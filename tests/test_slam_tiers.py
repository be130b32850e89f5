"""Grow-only SLAM-mode graph tiers: nothing is silently dropped.

The reference's SLAM mode iterates unbounded vertex/edge loops
(/root/reference/src/core/Optimizer.cpp:126-158,175-180) — every frame
vertex freed, every instance and observation included.  Round 4 shipped
a packer that silently truncated at 16 objects / 256 frames / 1024+512
edges; these tests pin the round-5 fix: capacities auto-size to
grow-only power-of-two tiers from the actual counts, zero drops at
36 objects / 300 frames, and explicit caps warn loudly instead of
silently truncating.
"""
import logging

import numpy as np
import pytest

import jax.numpy as jnp

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3
from object_oriented_slam_tpu.system.slam_mode import (build_slam_graph,
                                                       run_slam_mode)
from object_oriented_slam_tpu.system.state import SlamState
from object_oriented_slam_tpu.system.tracking import _np_se3_inv

N_FRAMES = 300
N_OBJ = 36
OBS2D_PER_OBJ = 10   # > the >2-obs gate
OBS3D_PER_OBJ = 5
K_MAT = np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]], np.float32)


def _make_state(rng):
    """300-frame orbit around a 6x6 grid of ellipsoids, observations
    spread over per-object frame windows; returns (state, gt_poses_wc)."""
    state = SlamState()
    gt_poses_wc = []
    for i in range(N_FRAMES):
        ang = 2 * np.pi * i / N_FRAMES
        t = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 1.2])
        z = -t / np.linalg.norm(t)            # look at the origin
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z], axis=1)
        q = np.asarray(se3.mat_to_quat(jnp.asarray(R.astype(np.float32))))
        pose_wc = np.concatenate([t, q]).astype(np.float64)
        noisy = pose_wc.copy()
        noisy[:3] += rng.normal(0, 0.02, 3)
        gt_poses_wc.append(pose_wc)
        state.frames_pose_wc.append(noisy)
        state.frames_ts.append(float(i))

    for k in range(N_OBJ):
        gx, gy = k % 6, k // 6
        gt = np.array([0.35 * (gx - 2.5), 0.35 * (gy - 2.5), 0.2,
                       0, 0, 0, 1, 0.12, 0.10, 0.08], np.float32)
        rec = state.record(k)
        rec.initialized = True
        rec.vec10 = gt.astype(np.float64) + np.concatenate(
            [rng.normal(0, 0.03, 3), np.zeros(4), rng.normal(0, 0.01, 3)])
        f0 = (k * 7) % (N_FRAMES - 40)
        for j in range(OBS2D_PER_OBJ):
            fb = f0 + 4 * j
            p_cw = _np_se3_inv(gt_poses_wc[fb]).astype(np.float32)
            bb = np.asarray(ell.project_bbox(
                jnp.asarray(gt), jnp.asarray(p_cw),
                jnp.asarray(K_MAT)))
            rec.obs2d_frame.append(fb)
            rec.obs2d_bbox.append(bb.astype(np.float64))
            rec.obs2d_pose_cw.append(p_cw.astype(np.float64))
            rec.obs2d_pose_wc.append(np.asarray(gt_poses_wc[fb]))
            rec.obs2d_prob.append(0.9)
        for j in range(OBS3D_PER_OBJ):
            fb = f0 + 8 * j
            p_wc = np.asarray(gt_poses_wc[fb], np.float32)
            meas = np.asarray(ell.transform_to(
                jnp.asarray(gt), jnp.asarray(p_wc)))
            rec.obs3d_frame.append(fb)
            rec.obs3d_meas.append(np.asarray(meas, np.float64))
            rec.obs3d_pose_wc.append(p_wc.astype(np.float64))
            rec.obs3d_prob.append(0.9)
    return state, np.stack(gt_poses_wc)


def test_auto_tiers_drop_nothing():
    rng = np.random.default_rng(5)
    state, _ = _make_state(rng)
    g, insts = build_slam_graph(state, LMConfig(), gravity_on=False)
    # every frame, object, and observation present — zero drops
    assert int(np.asarray(g.frame_mask).sum()) == N_FRAMES
    assert len(insts) == N_OBJ
    assert int(np.asarray(g.obj_mask).sum()) == N_OBJ
    assert np.count_nonzero(np.asarray(g.e2_w)) == N_OBJ * OBS2D_PER_OBJ
    assert np.count_nonzero(np.asarray(g.e3_w)) == N_OBJ * OBS3D_PER_OBJ
    assert np.count_nonzero(np.asarray(g.odo_w)) == N_FRAMES - 1
    # capacities are the grow-only power-of-two tiers above the counts
    assert g.poses_cw.shape[0] == 512
    assert g.objects.shape[0] == 64
    assert g.e2_bbox.shape[0] == 512      # 360 edges -> 512 tier
    assert g.e3_meas.shape[0] == 256      # 180 edges -> 256 tier


def test_explicit_caps_warn_loudly(caplog):
    rng = np.random.default_rng(5)
    state, _ = _make_state(rng)
    with caplog.at_level(logging.WARNING, "object_oriented_slam_tpu"):
        g, insts = build_slam_graph(state, LMConfig(), max_frames=256,
                                    max_objects=16, max_e2=64, max_e3=32,
                                    gravity_on=False)
    text = caplog.text
    assert "max_frames=256" in text
    assert "DROPPING 20 objects" in text
    assert "max_e2=64" in text and "max_e3=32" in text
    assert len(insts) == 16


@pytest.mark.slow
def test_refine_300_frames_36_objects():
    """End-to-end SLAM refinement at the grown tiers (512 frames cap /
    64 objects cap) — the round-4 verdict's done-criterion scene."""
    rng = np.random.default_rng(5)
    state, gt_poses = _make_state(rng)
    cfg = LMConfig(iters=5, gravity_on=False)
    poses_ref, obj_ref, chi2 = run_slam_mode(state, K_MAT, cfg,
                                             gravity_on=False)
    assert poses_ref.shape[0] == N_FRAMES
    assert len(obj_ref) == N_OBJ
    assert np.isfinite(chi2)
    assert np.all(np.isfinite(poses_ref))
    # chi2 strictly below the initial value of the packed graph
    g, _ = build_slam_graph(state, cfg, gravity_on=False)
    chi2_0 = float(slam_ba._chi2(g.poses_cw, g.objects, g,
                                 jnp.asarray(K_MAT), jnp.zeros(3)))
    assert chi2 < 0.5 * chi2_0
    # refined objects stay at scene scale near their ground truth
    for k, v in obj_ref.items():
        assert np.all(np.isfinite(v))
        assert np.linalg.norm(v[:3]) < 2.0
