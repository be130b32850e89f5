import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core import plane as pl
from object_oriented_slam_tpu.core import se3

RNG = np.random.default_rng(2)


def test_from_point_normal():
    p = jnp.asarray(np.array([1.0, 2.0, 3.0], np.float32))
    n = jnp.asarray(np.array([0.0, 0.0, 1.0], np.float32))
    pi = pl.from_point_normal(p, n)
    assert np.allclose(np.asarray(pi), [0, 0, 1, -3], atol=1e-6)
    assert abs(float(pl.distance_to_point(pi, p))) < 1e-6


def test_from_dis_angle():
    pi = np.asarray(pl.from_dis_angle(jnp.float32(0.5), jnp.float32(0.0)))
    # angle 0: normal (0,-1,0), D=-0.5
    assert np.allclose(pi, [0, -1, 0, -0.5], atol=1e-6)


def test_transform_preserves_incidence():
    for _ in range(5):
        point = RNG.normal(size=3).astype(np.float32)
        normal = RNG.normal(size=3).astype(np.float32)
        normal /= np.linalg.norm(normal)
        pi = pl.from_point_normal(jnp.asarray(point), jnp.asarray(normal))
        q = RNG.normal(size=4); q /= np.linalg.norm(q)
        T = jnp.asarray(np.concatenate([RNG.normal(size=3), q]).astype(np.float32))
        pi_w = pl.transform(pi, T)
        pt_w = se3.se3_apply(T, jnp.asarray(point))
        assert abs(float(pl.distance_to_point(pi_w, pt_w))) < 1e-4


def test_mirror_points_involution():
    pts = RNG.normal(size=(20, 3)).astype(np.float32)
    pi = pl.from_dis_angle(jnp.float32(0.3), jnp.float32(0.7))
    m = pl.mirror_points(pi, jnp.asarray(pts))
    mm = np.asarray(pl.mirror_points(pi, m))
    assert np.allclose(mm, pts, atol=1e-5)
    # mirrored points are equidistant on the other side
    d1 = np.asarray(pl.distance_to_point(pi, jnp.asarray(pts), keep_flag=True))
    d2 = np.asarray(pl.distance_to_point(pi, m, keep_flag=True))
    assert np.allclose(d1, -d2, atol=1e-5)


def test_oplus_2dof_semantics():
    # starting from dis/angle plane, oplus with zero is identity (up to norm)
    pi = pl.from_dis_angle(jnp.float32(0.4), jnp.float32(0.2))
    pi2 = np.asarray(pl.oplus_2dof(pi, jnp.zeros(2)))
    assert np.allclose(pi2, np.asarray(pl.normalize(pi)), atol=1e-5)
    # distance bump moves distance by exactly that amount
    pi3 = pl.oplus_2dof(pi, jnp.asarray(np.array([0.0, 0.1], np.float32)))
    assert abs(float(pl.distance(pi3)) - 0.5) < 1e-5
    # azimuth bump rotates the normal about z by that angle
    pi4 = pl.oplus_2dof(pi, jnp.asarray(np.array([0.25, 0.0], np.float32)))
    az0 = float(pl.azimuth(pi))
    az1 = float(pl.azimuth(pi4))
    assert abs((az1 - az0) - 0.25) < 1e-4


def test_dual_other_plane_is_perpendicular():
    # GenerateAnotherPlaneVec (Plane.cpp:137-144) feeds azimuth() back into
    # fromDisAndAngle; since a plane built with angle t has azimuth t - pi/2,
    # the second plane of a dual-reflection pair is PERPENDICULAR to the first
    # (two orthogonal symmetry planes, e.g. keyboard/suitcase).
    pi = pl.from_dis_angle(jnp.float32(0.4), jnp.float32(0.2))
    other = pl.dual_other_plane(pi, jnp.float32(0.9))
    n1 = np.asarray(pi)[:3]
    n2 = np.asarray(other)[:3]
    assert abs(np.dot(n1, n2)) < 1e-5
    assert abs(float(pl.distance(other)) - 0.9) < 1e-5
