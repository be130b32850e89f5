import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from object_oriented_slam_tpu.core import se3

RNG = np.random.default_rng(0)


def rand_quat():
    q = RNG.normal(size=4)
    return (q / np.linalg.norm(q)).astype(np.float32)


def rand_pose():
    return np.concatenate([RNG.normal(size=3), rand_quat()]).astype(np.float32)


def test_quat_mul_matches_scipy():
    for _ in range(10):
        q1, q2 = rand_quat(), rand_quat()
        got = np.asarray(se3.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
        assert np.allclose(got, want, atol=1e-5) or np.allclose(got, -want, atol=1e-5)


def test_quat_rotate_matches_matrix():
    for _ in range(10):
        q = rand_quat()
        v = RNG.normal(size=3).astype(np.float32)
        got = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        want = Rotation.from_quat(q).apply(v)
        assert np.allclose(got, want, atol=1e-5)


def test_quat_mat_roundtrip():
    for _ in range(10):
        q = rand_quat()
        m = se3.quat_to_mat(jnp.asarray(q))
        q2 = np.asarray(se3.mat_to_quat(m))
        assert np.allclose(q2, q, atol=1e-5) or np.allclose(q2, -q, atol=1e-5)


def test_se3_mul_inv():
    for _ in range(10):
        a, b = rand_pose(), rand_pose()
        ab = se3.se3_mul(jnp.asarray(a), jnp.asarray(b))
        # check against homogeneous matrices
        Mab = np.asarray(se3.se3_to_mat(ab))
        want = np.asarray(se3.se3_to_mat(jnp.asarray(a))) @ np.asarray(
            se3.se3_to_mat(jnp.asarray(b)))
        assert np.allclose(Mab, want, atol=1e-5)

        inv = se3.se3_inv(jnp.asarray(a))
        ident = se3.se3_mul(jnp.asarray(a), inv)
        assert np.allclose(np.asarray(ident[:3]), 0, atol=1e-5)
        assert abs(float(jnp.abs(ident[6])) - 1) < 1e-5


def test_se3_exp_log_roundtrip():
    for scale in [1e-4, 0.1, 1.0]:
        u = (RNG.normal(size=6) * scale).astype(np.float32)
        if np.linalg.norm(u[:3]) >= np.pi:  # log returns the principal value
            u[:3] *= 3.0 / np.linalg.norm(u[:3])
        p = se3.se3_exp(jnp.asarray(u))
        u2 = np.asarray(se3.se3_log(p))
        assert np.allclose(u2, u, atol=1e-4), (scale, u, u2)
    # and the other direction on random poses
    for _ in range(5):
        p = rand_pose()
        p2 = np.asarray(se3.se3_exp(se3.se3_log(jnp.asarray(p))))
        assert np.allclose(p2[:3], p[:3], atol=1e-4)
        assert (np.allclose(p2[3:], p[3:], atol=1e-4)
                or np.allclose(p2[3:], -p[3:], atol=1e-4))


def test_se3_exp_rotation_first_convention():
    # pure rotation tangent: translation part must stay zero
    u = np.array([0.3, -0.2, 0.5, 0, 0, 0], dtype=np.float32)
    p = np.asarray(se3.se3_exp(jnp.asarray(u)))
    assert np.allclose(p[:3], 0, atol=1e-6)
    # pure translation tangent: quaternion must be identity
    u = np.array([0, 0, 0, 1.0, -2.0, 3.0], dtype=np.float32)
    p = np.asarray(se3.se3_exp(jnp.asarray(u)))
    assert np.allclose(p[:3], [1, -2, 3], atol=1e-6)
    assert np.allclose(p[3:], [0, 0, 0, 1], atol=1e-6)


def test_euler_zyx_roundtrip():
    for _ in range(10):
        rpy = RNG.uniform(-1.2, 1.2, size=3).astype(np.float32)
        q = se3.zyx_euler_to_quat(*[jnp.asarray(v) for v in rpy])
        rpy2 = np.asarray(se3.quat_to_euler_zyx(q))
        assert np.allclose(rpy2, rpy, atol=1e-5)
        R = se3.euler_zyx_to_rot(*[jnp.asarray(v) for v in rpy])
        rpy3 = np.asarray(se3.rot_to_euler_zyx(R))
        assert np.allclose(rpy3, rpy, atol=1e-5)
        # euler matrix must equal quaternion matrix
        assert np.allclose(np.asarray(se3.quat_to_mat(q)), np.asarray(R), atol=1e-5)


def test_euler_matches_scipy_zyx():
    rpy = np.array([0.3, -0.4, 0.9], dtype=np.float32)
    R = np.asarray(se3.euler_zyx_to_rot(*[jnp.asarray(v) for v in rpy]))
    want = Rotation.from_euler("ZYX", [rpy[2], rpy[1], rpy[0]]).as_matrix()
    assert np.allclose(R, want, atol=1e-5)
