"""Banded + low-rank SLAM BA: equivalence to the dense Schur path.

The pose Hessian of the chain-odometry graph is block-tridiagonal, so
build_normal_equations_banded / solve_schur_step_banded must reproduce
the dense [F,6,F,6] formulation up to f32 reduction order; the
frame-sharded variant (ppermute halos + [K,9] psum) must match in turn.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

# the banded-vs-dense / sharded-vs-replicated equivalences compile the
# largest CPU programs of the suite (~12 min of the old 'quick' tier's
# 34, VERDICT r3 item 4); the quick tier keeps SLAM coverage via
# tests/test_slam_quick.py
pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.backend import slam_ba
from object_oriented_slam_tpu.backend.lm import LMConfig
from object_oriented_slam_tpu.parallel.dist_slam import (
    AXIS, optimize_slam_sharded, pad_graph_edges, pad_graph_frames,
    solve_schur_framesharded_banded)
from jax.sharding import Mesh

from test_slam_ba import build_graph
from test_svd_init import K as K_np

Kj = jnp.asarray(K_np)


def test_banded_assembly_matches_dense():
    g, _, _ = build_graph(F=10)
    Hpp, bp, Hoo, bo, U = slam_ba.build_normal_equations(
        g.poses_cw, g.objects, g, Kj, jnp.zeros(3))
    D, B, bp2, Hoo2, bo2, U2 = slam_ba.build_normal_equations_banded(
        g.poses_cw, g.objects, g, Kj, jnp.zeros(3))
    F = bp.shape[0]
    Hpp = np.asarray(Hpp)
    # diagonal blocks
    Dd = np.stack([Hpp[f, :, f, :] for f in range(F)])
    assert np.allclose(np.asarray(D), Dd, atol=1e-3)
    # off-diagonal (f, f+1) blocks; everything else zero
    for f in range(F - 1):
        assert np.allclose(np.asarray(B)[f], Hpp[f, :, f + 1, :], atol=1e-3)
        for gcol in range(F):
            if abs(gcol - f) > 1:
                assert np.abs(Hpp[f, :, gcol, :]).max() < 1e-5
    assert np.allclose(np.asarray(bp2), np.asarray(bp), atol=1e-3)
    assert np.allclose(np.asarray(Hoo2), np.asarray(Hoo), atol=1e-3)
    assert np.allclose(np.asarray(bo2), np.asarray(bo), atol=1e-3)
    assert np.allclose(np.asarray(U2), np.asarray(U), atol=1e-3)


def test_banded_solve_matches_dense():
    g, _, _ = build_graph(F=12)
    cfg = LMConfig(iters=8, gravity_on=False)
    p_d, o_d, c_d = slam_ba.optimize_slam(g, Kj, jnp.zeros(3), cfg)
    p_b, o_b, c_b = slam_ba.optimize_slam(g, Kj, jnp.zeros(3), cfg,
                                          banded=True)
    assert np.allclose(np.asarray(p_b), np.asarray(p_d), atol=2e-3), \
        np.abs(np.asarray(p_b) - np.asarray(p_d)).max()
    assert np.allclose(np.asarray(o_b), np.asarray(o_d), atol=2e-3)
    assert np.isclose(float(c_b), float(c_d), rtol=1e-2, atol=1e-3)


def test_banded_recovers_gt():
    g, _, _ = build_graph(F=12)
    cfg = LMConfig(iters=10, gravity_on=False)
    poses, objects, chi2 = slam_ba.optimize_slam(g, Kj, jnp.zeros(3), cfg,
                                                 banded=True)
    assert float(chi2) < 1e-2
    assert np.allclose(np.asarray(objects)[0, :3], [0.3, 0.1, 0.4],
                       atol=0.02)


@pytest.mark.parametrize("ndev", [2, 4])
@pytest.mark.parametrize("shard_solve", [False, True])
def test_banded_sharded_matches_replicated(ndev, shard_solve):
    devices = np.array(jax.devices()[:ndev])
    mesh = Mesh(devices, (AXIS,))
    g, _, _ = build_graph(F=12)
    cfg = LMConfig(iters=6, gravity_on=False)
    g_pad = pad_graph_frames(pad_graph_edges(g, ndev), ndev) \
        if shard_solve else pad_graph_edges(g, ndev)
    p_r, o_r, c_r = slam_ba.optimize_slam(g_pad, Kj, jnp.zeros(3), cfg,
                                          banded=True)
    p_s, o_s, c_s = optimize_slam_sharded(g, Kj, jnp.zeros(3), mesh, cfg,
                                          shard_solve=shard_solve,
                                          banded=True)
    F = np.asarray(g.poses_cw).shape[0]
    assert np.allclose(np.asarray(p_s)[:F], np.asarray(p_r)[:F],
                       atol=2e-3), \
        np.abs(np.asarray(p_s)[:F] - np.asarray(p_r)[:F]).max()
    assert np.allclose(np.asarray(o_s), np.asarray(o_r), atol=2e-3)


def test_framesharded_banded_solve_matches_replicated():
    ndev = 4
    devices = np.array(jax.devices()[:ndev])
    mesh = Mesh(devices, (AXIS,))
    g0, _, _ = build_graph(F=12)
    g = pad_graph_frames(g0, ndev)
    D, B, bp, Hoo, bo, U = slam_ba.build_normal_equations_banded(
        g.poses_cw, g.objects, g, Kj, jnp.zeros(3))
    F = bp.shape[0]
    free_frame = g.frame_mask & (jnp.arange(F) > 0)
    free_obj = g.obj_mask
    lam = jnp.float32(1e-4)
    dxp_r, dxo_r, _ = slam_ba.solve_schur_step_banded(
        D, B, bp, Hoo, bo, U, lam, free_frame, free_obj, 48)
    dxp_s, dxo_s, _ = solve_schur_framesharded_banded(
        D, B, bp, Hoo, bo, U, lam, free_frame, free_obj, 48, mesh)
    assert np.allclose(np.asarray(dxp_s), np.asarray(dxp_r), atol=5e-4), \
        np.abs(np.asarray(dxp_s) - np.asarray(dxp_r)).max()
    assert np.allclose(np.asarray(dxo_s), np.asarray(dxo_r), atol=5e-4)
