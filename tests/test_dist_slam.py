"""Edge-sharded SLAM-mode BA must match the single-chip solver."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import Mesh

from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.parallel.dist_slam import (
    optimize_slam_sharded, pad_graph_edges, pad_graph_frames,
    solve_schur_framesharded)

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


@pytest.mark.parametrize("ndev", [2, 4])
def test_framesharded_schur_solve_matches_replicated(ndev):
    """solve_schur_framesharded == slam_ba.solve_schur_step on one set of
    assembled normal equations (same damping init, same CG iterates)."""
    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("edge",))
    g, _, _ = build_graph(F=12, K=2)
    g = pad_graph_frames(g, ndev)
    Kj = jnp.asarray(K_np)
    normal = jnp.zeros(3)
    F = g.poses_cw.shape[0]
    free_frame = g.frame_mask & (jnp.arange(F) > 0)
    free_obj = g.obj_mask

    Hpp, bp, Hoo, bo, U = slam_ba.build_normal_equations(
        g.poses_cw, g.objects, g, Kj, normal)
    lam = jnp.float32(-1.0)
    dxp_s, dxo_s, lam_s = slam_ba.solve_schur_step(
        Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj, cg_iters=48)
    dxp_d, dxo_d, lam_d = solve_schur_framesharded(
        Hpp, bp, Hoo, bo, U, lam, free_frame, free_obj, 48, mesh)

    assert np.allclose(float(lam_s), float(lam_d), rtol=1e-6)
    # psum'd CG dot products vs full-array sums: f32 reduction-order
    # differences compound over 48 CG iterations (measured ~3e-4)
    assert np.allclose(np.asarray(dxp_d), np.asarray(dxp_s), atol=1e-3), \
        np.abs(np.asarray(dxp_d) - np.asarray(dxp_s)).max()
    assert np.allclose(np.asarray(dxo_d), np.asarray(dxo_s), atol=1e-3), \
        np.abs(np.asarray(dxo_d) - np.asarray(dxo_s)).max()


def test_sharded_solve_slam_converges():
    """Full LM with the frame-sharded Schur solve reaches the solution."""
    ndev = 8
    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("edge",))
    g, gt_cw, gt_obj = build_graph()          # F=12 -> padded to 16
    cfg = LMConfig(iters=8)
    poses, objs, chi2 = optimize_slam_sharded(
        g, jnp.asarray(K_np), jnp.zeros(3), mesh, cfg, shard_solve=True)
    assert float(chi2) < 1e-2, float(chi2)
    F = gt_cw.shape[0]
    poses = np.asarray(poses)[:F]
    t_err = np.linalg.norm(poses[:, :3] - gt_cw[:, :3], axis=1)
    assert t_err.max() < 0.02, t_err
    o_err = np.linalg.norm(np.asarray(objs)[:, :3] - gt_obj[:, :3], axis=1)
    assert o_err.max() < 0.02, o_err


def test_pad_graph_frames_noop():
    g, _, _ = build_graph(F=6, K=1)
    g_pad = pad_graph_frames(g, 8)
    assert g_pad.poses_cw.shape[0] == 8
    assert not bool(np.asarray(g_pad.frame_mask)[6:].any())
    cfg = LMConfig(iters=6)
    Kj = jnp.asarray(K_np)
    p1, o1, _ = slam_ba.optimize_slam(g, Kj, jnp.zeros(3), cfg)
    p2, o2, _ = slam_ba.optimize_slam(g_pad, Kj, jnp.zeros(3), cfg)
    # padded frames change the F-axis reduction order of every einsum /
    # segment_sum: f32 noise compounds over 6 LM iterations (~1e-4)
    assert np.allclose(np.asarray(p1), np.asarray(p2)[:6], atol=5e-4)
    assert np.allclose(np.asarray(o1), np.asarray(o2), atol=5e-4)


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
