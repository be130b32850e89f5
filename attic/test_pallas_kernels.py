"""Pallas BA kernels: interpret-mode correctness vs the jnp reference.

On the real chip these kernels compile through Mosaic (all math is
Mosaic-safe: no atan2, no tiny-dot_general, no cross-lane reshape); in CI
they run in interpreter mode on CPU.  NOTE: with the current remote-compile
service the full jacfwd kernel's Mosaic compile is impractically slow, so
the default backend stays on the XLA path; these tests pin correctness for
when the kernels are enabled.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_oriented_slam_tpu.backend import residuals as res
from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.ops.pallas import ba_kernels as bk
from object_oriented_slam_tpu.ops.pallas.compat import atan2_poly

import __graft_entry__ as G


def _ref_neq(est, poses, data, w, K, which):
    def one(e, p, b, wo):
        def rfun(u):
            eu = ell.exp_update(e, u)
            if which == "2d":
                r = jax.vmap(lambda pp, bb: res.residual_proj(
                    eu, pp, K, bb))(p, b)
            else:
                r = jax.vmap(lambda pp, mm: res.residual_3d(
                    eu, pp, mm))(p, b)
            r = r * wo[:, None]
            return jnp.where(jnp.isfinite(r), r, 0.0)
        z = jnp.zeros(9)
        r = rfun(z)
        J = jax.jacfwd(rfun)(z)
        return (jnp.einsum("bai,baj->ij", J, J),
                jnp.einsum("bai,ba->i", J, r), jnp.sum(r * r))
    return jax.vmap(one)(est, poses, data, w)


@pytest.fixture(scope="module")
def workload():
    obs, K, _ = G._tiny_workload(O=3, M2=128, M3=128)
    w2 = jnp.where(obs.mask2d, jnp.sqrt(obs.prob2d), 0.0)
    w3 = jnp.where(obs.mask3d, jnp.sqrt(obs.prob3d * 100), 0.0)
    return obs, K, w2, w3


def test_atan2_poly_accuracy():
    ys = np.linspace(-3, 3, 41)
    xs = np.linspace(-3, 3, 41)
    Y, X = np.meshgrid(ys, xs)
    mask = (np.abs(Y) + np.abs(X)) > 1e-3
    got = np.asarray(atan2_poly(jnp.asarray(Y), jnp.asarray(X)))
    want = np.arctan2(Y, X)
    assert np.abs((got - want)[mask]).max() < 1e-5


def test_project_bbox_dual_matches_reference_path():
    rng = np.random.default_rng(5)
    from object_oriented_slam_tpu.core import se3
    K = jnp.asarray(np.array([[535.4, 0, 320.1], [0, 539.2, 247.6],
                              [0, 0, 1]], np.float32))
    for _ in range(10):
        v9 = np.r_[rng.normal(0, 0.5, 2), 4.0 + rng.normal(0, 0.5),
                   rng.uniform(-1, 1, 3), rng.uniform(0.2, 0.8, 3)]
        e = ell.from_minimal(jnp.asarray(np.r_[v9[:2], v9[2:]].astype(np.float32)))
        a = np.asarray(ell.project_bbox(e, se3.se3_identity(), K))
        b = np.asarray(ell.project_bbox_dual(e, se3.se3_identity(), K))
        assert np.allclose(a, b, rtol=1e-3, atol=0.5), (a, b)


def test_edge2d_kernel_interpret(workload):
    obs, K, w2, _ = workload
    H0, g0, c0 = _ref_neq(obs.est0, obs.pose2d_cw, obs.bbox2d, w2, K, "2d")
    H1, g1, c1 = bk.edge2d_normal_eq(obs.est0, obs.pose2d_cw, obs.bbox2d,
                                     w2, K, interpret=True)
    # the dual-conic path yields the exact zero yaw-derivative at symmetric
    # viewpoints where the atan2 ellipse path produces small f32 noise, so
    # tolerances are relative to the dominant H scale (~1e6 here)
    assert np.allclose(np.asarray(H1), np.asarray(H0), rtol=2e-3, atol=1e3)
    assert np.allclose(np.asarray(g1), np.asarray(g0), rtol=2e-3, atol=60.0)
    assert np.allclose(np.asarray(c1), np.asarray(c0), rtol=1e-3)


def test_edge3d_kernel_interpret(workload):
    obs, K, _, w3 = workload
    H0, g0, c0 = _ref_neq(obs.est0, obs.pose3d_wc, obs.meas3d, w3, K, "3d")
    H1, g1, c1 = bk.edge3d_normal_eq(obs.est0, obs.pose3d_wc, obs.meas3d,
                                     w3, interpret=True)
    assert np.allclose(np.asarray(c1), np.asarray(c0), rtol=1e-3)
    assert np.allclose(np.asarray(H1), np.asarray(H0), rtol=1e-2, atol=50.0)


def test_chi2_kernels_interpret(workload):
    obs, K, w2, w3 = workload
    c2 = bk.edge2d_chi2(obs.est0, obs.pose2d_cw, obs.bbox2d, w2, K,
                        interpret=True)
    _, _, c2_ref = _ref_neq(obs.est0, obs.pose2d_cw, obs.bbox2d, w2, K, "2d")
    assert np.allclose(np.asarray(c2), np.asarray(c2_ref), rtol=1e-3)
    c3 = bk.edge3d_chi2(obs.est0, obs.pose3d_wc, obs.meas3d, w3,
                        interpret=True)
    _, _, c3_ref = _ref_neq(obs.est0, obs.pose3d_wc, obs.meas3d, w3, K, "3d")
    assert np.allclose(np.asarray(c3), np.asarray(c3_ref), rtol=1e-3)
