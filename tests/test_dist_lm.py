"""Distributed (shard_map) backend must match the single-chip backend."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from object_oriented_slam_tpu.backend import LMConfig, optimize_objects
from object_oriented_slam_tpu.parallel import optimize_objects_sharded

from test_backend_lm import K, empty_obs, orbit_poses
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3


def make_workload():
    gt = np.array([0.2, -0.1, 0.4, 0, 0, 0, 1, 0.5, 0.3, 0.25], np.float32)
    n = 24
    poses_wc = orbit_poses(gt[:3], n)
    est0 = np.tile(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32), (4, 1))
    est0[0] = gt + np.r_[0.15, -0.1, 0.05, np.zeros(4), 0.05, -0.02, 0.01]
    est0[0][3:7] = [0, 0, 0, 1]
    obj_mask = np.zeros(4, bool); obj_mask[0] = True
    obs = empty_obs(est0, obj_mask)
    bboxes = np.stack([np.asarray(ell.project_bbox(
        jnp.asarray(gt), se3.se3_inv(jnp.asarray(p)), jnp.asarray(K)))
        for p in poses_wc])
    meas = np.stack([np.asarray(ell.transform_to(jnp.asarray(gt),
                                                 jnp.asarray(p)))
                     for p in poses_wc[:16]])
    obs = obs._replace(
        pose2d_cw=obs.pose2d_cw.at[0, :n].set(jnp.asarray(np.stack(
            [np.asarray(se3.se3_inv(jnp.asarray(p))) for p in poses_wc]))),
        bbox2d=obs.bbox2d.at[0, :n].set(jnp.asarray(bboxes)),
        prob2d=obs.prob2d.at[0, :n].set(1.0),
        mask2d=obs.mask2d.at[0, :n].set(True),
        pose3d_wc=obs.pose3d_wc.at[0, :16].set(jnp.asarray(poses_wc[:16])),
        meas3d=obs.meas3d.at[0, :16].set(jnp.asarray(meas)),
        prob3d=obs.prob3d.at[0, :16].set(1.0),
        mask3d=obs.mask3d.at[0, :16].set(True),
    )
    return gt, obs


@pytest.mark.slow
@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_matches_single(ndev):
    devices = jax.devices()[:ndev]
    assert len(devices) == ndev
    mesh = Mesh(np.array(devices), ("obs",))
    gt, obs = make_workload()
    cfg = LMConfig(gravity_on=True, gravity_scale=10.0)
    normal = jnp.asarray(np.array([0, 0, 1], np.float32))

    est_s, chi2_s = optimize_objects(obs, jnp.asarray(K), normal, True, cfg)
    est_d, chi2_d = optimize_objects_sharded(obs, jnp.asarray(K), normal,
                                             True, mesh, cfg)
    est_s, est_d = np.asarray(est_s), np.asarray(est_d)
    # identical iterates up to float reduction order
    assert np.allclose(est_d[0], est_s[0], atol=1e-3), (est_d[0], est_s[0])
    assert np.allclose(est_d[0][:3], gt[:3], atol=0.02)
    # untouched object slots preserved
    assert np.allclose(est_d[1:], np.asarray(obs.est0)[1:], atol=1e-6)


def test_system_distributed_backend_cabinet():
    """System.open_distributed_backend: the sharded backend drops into the
    tracking loop (2D-only cabinet slice) and matches the single-chip map."""
    import os
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.system import System

    cabinet = "/root/reference/Example/dataset/cabinet/"
    yaml = "/root/reference/Example/param/TUM3.yaml"
    if not os.path.exists(cabinet):
        pytest.skip("cabinet dataset unavailable")

    def run(distributed):
        ds = TUMDataset(cabinet)
        slam = System(yaml)
        if distributed:
            slam.open_distributed_backend()
            assert slam.tracker._mesh is not None
        for n, (i, ts, pose, depth, rgb, det) in enumerate(ds.frames()):
            slam.track_with_objects(ts, pose, det, depth=None, rgb=None,
                                    with_association=True)
            if n >= 24:       # past SVD init (15 obs) + several LM frames
                break
        slam.tracker.sync()
        return slam.map_objects

    objs_s = run(False)
    objs_d = run(True)
    assert set(objs_d) == set(objs_s) and 0 in objs_d
    assert np.allclose(objs_d[0], objs_s[0], atol=1e-3), \
        np.abs(objs_d[0] - objs_s[0]).max()
