"""Quick-tier SLAM-mode smoke (the full equivalence/GT suites are
slow-marked: test_slam_ba.py, test_slam_banded.py, test_slam_oracle.py).

Tiny graph, two LM iterations, dense solver: compiles the smallest
possible joint pose+object program while still asserting the core
contract — chi2 decreases, frame 0 stays gauge-fixed, outputs finite.
"""
import numpy as np

import jax.numpy as jnp

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend.slam_ba import (SlamGraph, _chi2,
                                                      optimize_slam)
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

F = 4
K = jnp.asarray(np.array([[300.0, 0, 160], [0, 300, 120], [0, 0, 1]],
                         np.float32))


def test_slam_smoke():
    rng = np.random.default_rng(0)
    gt = np.array([0, 0, 0.3, 0, 0, 0, 1, 0.4, 0.3, 0.25], np.float32)
    poses_cw, e2b, e3m = [], [], []
    for i in range(F):
        ang = 2 * np.pi * i / F
        t = np.array([2.0 * np.cos(ang), 2.0 * np.sin(ang), 0.8])
        z = gt[:3] - t
        z /= np.linalg.norm(z)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        R = np.stack([x, np.cross(z, x), z], axis=1)
        q = np.asarray(se3.mat_to_quat(jnp.asarray(R.astype(np.float32))))
        p_cw = np.asarray(se3.se3_inv(jnp.asarray(
            np.concatenate([t, q]).astype(np.float32))))
        poses_cw.append(p_cw)
        e2b.append(np.asarray(ell.project_bbox(
            jnp.asarray(gt), jnp.asarray(p_cw), K)))
        e3m.append(np.asarray(ell.transform_to(
            jnp.asarray(gt), se3.se3_inv(jnp.asarray(p_cw)))))
    poses_cw = np.stack(poses_cw).astype(np.float32)
    odo = np.stack([np.asarray(se3.se3_mul(
        jnp.asarray(poses_cw[i + 1]), se3.se3_inv(
            jnp.asarray(poses_cw[i])))) for i in range(F - 1)])
    init_cw = poses_cw.copy()
    init_cw[1:, :3] += rng.normal(0, 0.02, (F - 1, 3)).astype(np.float32)
    init_obj = gt.copy()
    init_obj[:3] += rng.normal(0, 0.04, 3).astype(np.float32)

    g = SlamGraph(
        poses_cw=jnp.asarray(init_cw), frame_mask=jnp.ones(F, bool),
        objects=jnp.asarray(init_obj)[None], obj_mask=jnp.ones(1, bool),
        e2_frame=jnp.arange(F, dtype=jnp.int32),
        e2_obj=jnp.zeros(F, jnp.int32),
        e2_bbox=jnp.asarray(np.stack(e2b).astype(np.float32)),
        e2_w=jnp.ones(F, jnp.float32),
        e3_frame=jnp.arange(F, dtype=jnp.int32),
        e3_obj=jnp.zeros(F, jnp.int32),
        e3_meas=jnp.asarray(np.stack(e3m).astype(np.float32)),
        e3_w=jnp.ones(F, jnp.float32),
        odo_i=jnp.arange(F - 1, dtype=jnp.int32),
        odo_j=jnp.arange(1, F, dtype=jnp.int32),
        odo_meas=jnp.asarray(odo.astype(np.float32)),
        odo_w=jnp.full(F - 1, 10.0, jnp.float32),
        grav_w=jnp.zeros(1, jnp.float32))
    normal = jnp.zeros(3, jnp.float32)

    chi2_0 = float(_chi2(g.poses_cw, g.objects, g, K, normal))
    poses, objs, chi2 = optimize_slam(g, K, normal, LMConfig(iters=2),
                                      cg_iters=16, banded=False)
    poses, objs = np.asarray(poses), np.asarray(objs)
    assert np.all(np.isfinite(poses)) and np.all(np.isfinite(objs))
    assert float(chi2) < chi2_0
    np.testing.assert_allclose(poses[0], init_cw[0], atol=1e-7)  # gauge
