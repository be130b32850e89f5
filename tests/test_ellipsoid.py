import jax
import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3

RNG = np.random.default_rng(1)


def rand_ellipsoid():
    v9 = np.concatenate([
        RNG.normal(size=3),
        RNG.uniform(-1.0, 1.0, size=3),
        RNG.uniform(0.2, 1.5, size=3),
    ]).astype(np.float32)
    return ell.from_minimal(jnp.asarray(v9)), v9


def test_minimal_roundtrip():
    e, v9 = rand_ellipsoid()
    v9b = np.asarray(ell.to_minimal(e))
    assert np.allclose(v9b, v9, atol=1e-5)


def test_exp_update_zero_is_identity():
    e, _ = rand_ellipsoid()
    e2 = ell.exp_update(e, jnp.zeros(9))
    assert np.allclose(np.asarray(e2), np.asarray(e), atol=1e-6)


def test_log_error_zero_for_same():
    e, _ = rand_ellipsoid()
    err = ell.log_error_9dof(e, e)
    assert np.allclose(np.asarray(err), 0, atol=1e-5)


def test_min_log_error_rotation_invariance():
    # an ellipsoid rotated 90 deg about z (with scale swap) is the same shape:
    # min_log_error must be ~0 (Ellipsoid.cpp:92-117 semantics)
    e, _ = rand_ellipsoid()
    rot = ell.rotate_yaw(e, 1)
    err = ell.min_log_error_9dof(e, rot)
    assert np.linalg.norm(np.asarray(err)) < 1e-4
    err = ell.min_log_error_9dof(e, ell.rotate_yaw(e, 2))
    assert np.linalg.norm(np.asarray(err)) < 1e-4


def test_transform_roundtrip():
    e, _ = rand_ellipsoid()
    T = jnp.asarray(np.concatenate([
        RNG.normal(size=3),
        Rotation_quat()]).astype(np.float32))
    e2 = ell.transform_to(ell.transform_from(e, T), T)
    assert np.allclose(np.asarray(e2), np.asarray(e), atol=1e-5)


def Rotation_quat():
    q = RNG.normal(size=4)
    return q / np.linalg.norm(q)


def test_quadric_of_unit_sphere():
    e = ell.make(se3.se3_identity(), jnp.ones(3))
    Q = np.asarray(ell.quadric_Qstar(e))
    assert np.allclose(Q, np.diag([1.0, 1.0, 1.0, -1.0]), atol=1e-6)


def _simple_cam():
    K = jnp.asarray(np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]],
                             dtype=np.float32))
    return K


def test_project_sphere_center():
    # sphere of radius r at distance z on the optical axis projects to a circle
    # centered at principal point with radius ~ f*r/sqrt(z^2-r^2)
    K = _simple_cam()
    z, r = 4.0, 0.5
    e = ell.make(jnp.asarray(np.array([0, 0, z, 0, 0, 0, 1], np.float32)),
                 jnp.full(3, r))
    pose_cw = se3.se3_identity()
    ellipse = np.asarray(ell.project_ellipse(e, pose_cw, K))
    assert np.allclose(ellipse[:2], [320, 240], atol=1e-2)
    expected_r = 500.0 * r / np.sqrt(z * z - r * r)
    assert np.allclose(ellipse[3], expected_r, rtol=1e-3)
    assert np.allclose(ellipse[4], expected_r, rtol=1e-3)

    bbox = np.asarray(ell.project_bbox(e, pose_cw, K))
    assert np.allclose(bbox, [320 - expected_r, 240 - expected_r,
                              320 + expected_r, 240 + expected_r], atol=1e-2)


def test_projected_bbox_inside_cube_bbox():
    # the conic bbox is always inside the projected circumscribed-cube bbox
    K = _simple_cam()
    for _ in range(5):
        e, _ = rand_ellipsoid()
        e = e.at[2].add(6.0)  # push in front of camera
        pose_cw = se3.se3_identity()
        bb = np.asarray(ell.project_bbox(e, pose_cw, K))
        cb = np.asarray(ell.project_cube_bbox(e, pose_cw, K))
        assert bb[0] >= cb[0] - 1e-2 and bb[1] >= cb[1] - 1e-2
        assert bb[2] <= cb[2] + 1e-2 and bb[3] <= cb[3] + 1e-2


def test_project_bbox_differentiable():
    K = _simple_cam()
    e, _ = rand_ellipsoid()
    e = e.at[2].add(5.0)
    pose_cw = se3.se3_identity()

    def f(u):
        return ell.project_bbox(ell.exp_update(e, u), pose_cw, K)

    J = np.asarray(jax.jacfwd(f)(jnp.zeros(9)))
    assert J.shape == (4, 9)
    assert np.all(np.isfinite(J))
    # numeric check
    h = 1e-3
    for k in range(9):
        u = np.zeros(9, np.float32)
        u[k] = h
        fp = np.asarray(f(jnp.asarray(u)))
        u[k] = -h
        fm = np.asarray(f(jnp.asarray(u)))
        num = (fp - fm) / (2 * h)
        assert np.allclose(J[:, k], num, atol=2e-1, rtol=5e-2), k


def test_observability():
    e = ell.make(jnp.asarray(np.array([0, 0, 5, 0, 0, 0, 1], np.float32)),
                 jnp.ones(3))
    assert bool(ell.is_observable(e, se3.se3_identity()))
    e_behind = e.at[2].set(-5.0)
    assert not bool(ell.is_observable(e_behind, se3.se3_identity()))


def test_exp_update_xyzabc():
    e, _ = rand_ellipsoid()
    u6 = jnp.asarray(np.array([0.1, -0.2, 0.3, 0.01, 0.02, 0.03], np.float32))
    out = ell.exp_update_xyzabc(e, u6)
    # rotation unchanged, translation moved in the body frame, scale added
    assert np.allclose(np.asarray(out[3:7]), np.asarray(e[3:7]), atol=1e-6)
    assert np.allclose(np.asarray(out[7:]), np.asarray(e[7:]) + [0.01, 0.02, 0.03],
                       atol=1e-6)
    R = se3.quat_to_mat(e[3:7])
    want_t = np.asarray(e[:3]) + np.asarray(R) @ np.array([0.1, -0.2, 0.3])
    assert np.allclose(np.asarray(out[:3]), want_t, atol=1e-5)


def test_project_cube_bbox_cwh():
    e, _ = rand_ellipsoid()
    e = e.at[2].add(6.0)
    K = _simple_cam()
    r = np.asarray(ell.project_cube_bbox(e, se3.se3_identity(), K))
    c = np.asarray(ell.project_cube_bbox_cwh(e, se3.se3_identity(), K))
    assert np.allclose(c[:2], (r[:2] + r[2:]) / 2, atol=1e-4)
    assert np.allclose(c[2:], r[2:] - r[:2], atol=1e-4)
