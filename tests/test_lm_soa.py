"""SoA backend equivalence: optimize_objects_soa vs optimize_objects.

The SoA path mirrors the AoS arithmetic term-for-term but assembles H/g
with different reduction orders, so agreement is to f32 round-off, not
bit-exact (same tolerance class as the observation-capacity tiers).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from object_oriented_slam_tpu.backend import (LMConfig, optimize_objects,
                                              optimize_objects_soa)
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

from test_backend_lm import O, empty_obs, orbit_poses
from test_svd_init import K

RNG = np.random.default_rng(11)


def _mixed_obs(with_nan=False):
    """All factor types at once: 2D + 3D edges, partial masks, one gated
    (2-obs) object, one empty slot, border-invalidated bbox coords."""
    gts = [
        np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32),
        np.array([-0.5, 0.8, 0.3, 0, 0, 0, 1, 0.3, 0.45, 0.2], np.float32),
        np.array([1.0, 0.2, 0.5, 0, 0, 0, 1, 0.25, 0.25, 0.4], np.float32),
    ]
    est0 = np.tile(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32),
                   (O, 1))
    obj_mask = np.zeros(O, bool)
    obs = None
    for o, gt in enumerate(gts):
        obj_mask[o] = True
        est0[o] = gt + np.r_[RNG.normal(0, 0.08, 3), np.zeros(4),
                             RNG.normal(0, 0.04, 3)].astype(np.float32)
        est0[o][3:7] = [0, 0, 0, 1]
    obs = empty_obs(est0, obj_mask)

    for o, gt in enumerate(gts):
        n2 = [12, 2, 8][o]  # object 1: gated off (<3 obs)
        poses_wc = orbit_poses(gt[:3], max(n2, 6))
        pcs = np.stack([np.asarray(se3.se3_inv(jnp.asarray(p)))
                        for p in poses_wc])
        bb = np.stack([np.asarray(ell.project_bbox(
            jnp.asarray(gt), jnp.asarray(pc), jnp.asarray(K)))
            for pc in pcs])
        bb[0, 0] = -1.0  # border-invalidated coordinate
        if with_nan and o == 0:
            bb[1] = np.nan  # whole edge dropped by the NaN gate
        obs = obs._replace(
            pose2d_cw=obs.pose2d_cw.at[o, :n2].set(jnp.asarray(pcs[:n2])),
            bbox2d=obs.bbox2d.at[o, :n2].set(jnp.asarray(bb[:n2])),
            prob2d=obs.prob2d.at[o, :n2].set(
                jnp.asarray(RNG.uniform(0.6, 1.0, n2).astype(np.float32))),
            mask2d=obs.mask2d.at[o, :n2].set(True),
        )
        n3 = [5, 4, 0][o]
        if n3:
            meas = np.stack([np.asarray(ell.transform_to(
                jnp.asarray(gt), jnp.asarray(p)))
                for p in poses_wc[:n3]])
            meas[:, :3] += RNG.normal(0, 0.01, (n3, 3))
            obs = obs._replace(
                pose3d_wc=obs.pose3d_wc.at[o, :n3].set(
                    jnp.asarray(poses_wc[:n3])),
                meas3d=obs.meas3d.at[o, :n3].set(jnp.asarray(meas)),
                prob3d=obs.prob3d.at[o, :n3].set(
                    jnp.asarray(RNG.uniform(0.5, 1.0, n3).astype(np.float32))),
                mask3d=obs.mask3d.at[o, :n3].set(True),
            )
    return obs


def _compare(obs, cfg, normal=np.zeros(3, np.float32), gset=False,
             atol=2e-3):
    est_a, chi_a = optimize_objects(obs, jnp.asarray(K),
                                    jnp.asarray(normal), gset, cfg)
    est_s, chi_s = optimize_objects_soa(obs, jnp.asarray(K),
                                        jnp.asarray(normal), gset, cfg)
    est_a, est_s = np.asarray(est_a), np.asarray(est_s)
    chi_a, chi_s = np.asarray(chi_a), np.asarray(chi_s)
    assert np.allclose(est_s, est_a, atol=atol), (
        np.abs(est_s - est_a).max())
    assert np.allclose(chi_s, chi_a, rtol=1e-2, atol=1e-3)
    return est_a, est_s


def test_soa_matches_aos_mixed():
    _compare(_mixed_obs(), LMConfig(gravity_on=False))


@pytest.mark.slow  # the 'mixed' variant stays in the quick tier
def test_soa_matches_aos_gravity():
    _compare(_mixed_obs(), LMConfig(gravity_on=True, gravity_scale=100.0),
             normal=np.array([0, 0, 1], np.float32), gset=True)


@pytest.mark.slow  # the 'mixed' variant stays in the quick tier
def test_soa_matches_aos_nan_gate():
    _compare(_mixed_obs(with_nan=True), LMConfig(gravity_on=False))


@pytest.mark.slow  # the 'mixed' variant stays in the quick tier
def test_soa_matches_aos_huber():
    _compare(_mixed_obs(), LMConfig(gravity_on=False, huber_delta=5.0))


def test_soa_gate_and_empty_slots():
    obs = _mixed_obs()
    cfg = LMConfig(gravity_on=False)
    est_s, _ = optimize_objects_soa(obs, jnp.asarray(K), jnp.zeros(3),
                                    False, cfg)
    est_s = np.asarray(est_s)
    # object 1 has 2 2D obs (gated) but 4 3D obs -> still optimized
    # object 3 is an empty slot -> unchanged
    assert np.allclose(est_s[3], np.asarray(obs.est0)[3], atol=1e-7)


def test_soa_converges_to_gt():
    obs = _mixed_obs()
    cfg = LMConfig(gravity_on=False)
    est_s, _ = optimize_objects_soa(obs, jnp.asarray(K), jnp.zeros(3),
                                    False, cfg)
    out = np.asarray(est_s[0])
    assert np.allclose(out[:3], [0.2, -0.1, 0.4], atol=0.03)
