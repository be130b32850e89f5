"""Edge-sharded SLAM-mode BA must match the single-chip solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.parallel.dist_slam import (
    optimize_slam_sharded, pad_graph_edges)

from test_slam_ba import build_graph
from test_svd_init import K as K_np


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_slam_matches_single(ndev):
    devices = jax.devices()[:ndev]
    assert len(devices) == ndev
    mesh = Mesh(np.array(devices), ("edge",))
    g, gt_cw, gt_obj = build_graph()
    cfg = LMConfig(iters=8)
    Kj = jnp.asarray(K_np)
    normal = jnp.zeros(3)

    # single-chip on the padded graph (padding adds zero-weight edges only)
    g_pad = pad_graph_edges(g, ndev)
    poses_s, objs_s, chi2_s = slam_ba.optimize_slam(g_pad, Kj, normal, cfg)
    poses_d, objs_d, chi2_d = optimize_slam_sharded(g, Kj, normal, mesh, cfg)

    poses_s, poses_d = np.asarray(poses_s), np.asarray(poses_d)
    objs_s, objs_d = np.asarray(objs_s), np.asarray(objs_d)
    # identical iterates up to f32 psum/segment-sum reduction order (which
    # can also flip a near-tied LM accept, hence the loose tolerance)
    assert np.allclose(poses_d, poses_s, atol=5e-3), \
        np.abs(poses_d - poses_s).max()
    assert np.allclose(objs_d, objs_s, atol=5e-3), \
        np.abs(objs_d - objs_s).max()
    # at convergence chi2 sits at the f32 noise floor where reduction
    # order flips the last accept; both must be converged, not equal
    assert float(chi2_d) < 1e-2 and float(chi2_s) < 1e-2, \
        (float(chi2_d), float(chi2_s))

    # and it actually solves the problem
    t_err = np.linalg.norm(poses_d[:, :3] - gt_cw[:, :3], axis=1)
    assert t_err.max() < 0.02, t_err
    o_err = np.linalg.norm(objs_d[:, :3] - gt_obj[:, :3], axis=1)
    assert o_err.max() < 0.02, o_err


def test_pad_graph_edges_noop_weights():
    g, _, _ = build_graph(F=6, K=1)
    g_pad = pad_graph_edges(g, 8)
    for fam in ("e2_w", "e3_w", "odo_w"):
        w = np.asarray(getattr(g_pad, fam))
        w0 = np.asarray(getattr(g, fam))
        assert w.shape[0] % 8 == 0
        assert np.all(w[w0.shape[0]:] == 0.0)
    # padded graph optimizes to the same solution as the raw graph
    cfg = LMConfig(iters=6)
    Kj = jnp.asarray(K_np)
    p1, o1, c1 = slam_ba.optimize_slam(g, Kj, jnp.zeros(3), cfg)
    p2, o2, c2 = slam_ba.optimize_slam(g_pad, Kj, jnp.zeros(3), cfg)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)
    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
