"""SVD quadric initializer tests on synthetic camera/bbox data."""
import jax
import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core import ellipsoid as ell
from object_oriented_slam_tpu.core import se3
from object_oriented_slam_tpu.init import init_quadric_svd, quadric_plane_error

RNG = np.random.default_rng(3)
K = np.array([[535.4, 0, 320.1], [0, 539.2, 247.6], [0, 0, 1]], np.float32)
ROWS, COLS = 480, 640


def look_at_pose(cam_pos, target):
    """Twc whose +z looks from cam_pos toward target."""
    z = target - cam_pos
    z = z / np.linalg.norm(z)
    up = np.array([0.0, 0.0, 1.0])
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z], axis=1)
    q = np.asarray(se3.mat_to_quat(jnp.asarray(R.astype(np.float32))))
    return np.concatenate([cam_pos, q]).astype(np.float32)


def make_observations(e_vec10, n_views=20, noise=0.0):
    """Project the gt ellipsoid into orbiting cameras, return poses+bboxes."""
    center = np.asarray(e_vec10[:3])
    poses, bboxes = [], []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        cam = center + np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.2])
        pose = look_at_pose(cam, center)
        bb = np.asarray(ell.project_bbox(
            jnp.asarray(e_vec10), se3.se3_inv(jnp.asarray(pose)),
            jnp.asarray(K)))
        bb = bb + RNG.normal(0, noise, 4)
        poses.append(pose)
        bboxes.append(bb.astype(np.float32))
    return np.stack(poses), np.stack(bboxes)


def test_recover_sphere():
    gt = np.array([0.5, -0.2, 0.3, 0, 0, 0, 1, 0.4, 0.4, 0.4], np.float32)
    poses, bboxes = make_observations(gt)
    mask = np.ones(len(poses), bool)
    res = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes),
                           jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    assert bool(res.ok)
    out = np.asarray(res.ellipsoid)
    assert np.allclose(out[:3], gt[:3], atol=0.02)
    assert np.allclose(sorted(out[7:]), sorted(gt[7:]), atol=0.03)


def test_recover_anisotropic_axis_aligned():
    gt = np.array([0.0, 0.0, 0.5, 0, 0, 0, 1, 0.6, 0.3, 0.2], np.float32)
    poses, bboxes = make_observations(gt, n_views=30)
    mask = np.ones(len(poses), bool)
    res = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes),
                           jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    assert bool(res.ok)
    out = np.asarray(res.ellipsoid)
    assert np.allclose(out[:3], gt[:3], atol=0.03)
    assert np.allclose(sorted(out[7:]), sorted(gt[7:]), atol=0.05)
    # residual metric small
    err = float(quadric_plane_error(res.ellipsoid, jnp.asarray(poses),
                                    jnp.asarray(bboxes), jnp.asarray(mask),
                                    jnp.asarray(K), ROWS, COLS))
    assert err < 1e-3


def test_too_few_planes_rejected():
    gt = np.array([0.0, 0.0, 0.5, 0, 0, 0, 1, 0.4, 0.4, 0.4], np.float32)
    poses, bboxes = make_observations(gt, n_views=2)  # 8 planes < 9
    mask = np.ones(len(poses), bool)
    res = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes),
                           jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    assert not bool(res.ok)
    assert int(res.n_planes) == 8


def test_border_edges_excluded():
    gt = np.array([0.0, 0.0, 0.5, 0, 0, 0, 1, 0.4, 0.4, 0.4], np.float32)
    poses, bboxes = make_observations(gt, n_views=12)
    # mark one bbox's x1 as border-invalid (-1): only that edge's plane drops
    bboxes[0, 0] = -1.0
    mask = np.ones(len(poses), bool)
    res = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes),
                           jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    assert int(res.n_planes) == 12 * 4 - 1
    assert bool(res.ok)
    out = np.asarray(res.ellipsoid)
    assert np.allclose(out[:3], gt[:3], atol=0.05)


def test_masked_out_observations_ignored():
    gt = np.array([0.0, 0.0, 0.5, 0, 0, 0, 1, 0.4, 0.4, 0.4], np.float32)
    poses, bboxes = make_observations(gt, n_views=20)
    # corrupt the masked-out rows wildly; result must be unaffected
    bboxes2 = bboxes.copy()
    bboxes2[10:] = RNG.uniform(0, 600, bboxes2[10:].shape)
    mask = np.zeros(20, bool)
    mask[:10] = True
    res_a = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes2),
                             jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    res_b = init_quadric_svd(jnp.asarray(poses[:10]), jnp.asarray(bboxes[:10]),
                             jnp.ones(10, bool), jnp.asarray(K), ROWS, COLS)
    assert bool(res_a.ok) and bool(res_b.ok)
    assert np.allclose(np.asarray(res_a.ellipsoid), np.asarray(res_b.ellipsoid),
                       atol=1e-3)


def test_vmapped_over_candidates():
    gts = [np.array([0.0, 0.0, 0.5, 0, 0, 0, 1, 0.4, 0.4, 0.4], np.float32),
           np.array([1.0, 1.0, 0.2, 0, 0, 0, 1, 0.5, 0.3, 0.2], np.float32)]
    all_poses, all_bboxes = [], []
    for gt in gts:
        p, b = make_observations(gt, n_views=15)
        all_poses.append(p)
        all_bboxes.append(b)
    poses = jnp.asarray(np.stack(all_poses))
    bboxes = jnp.asarray(np.stack(all_bboxes))
    mask = jnp.ones((2, 15), bool)
    Kj = jnp.asarray(K)
    res = jax.vmap(lambda p, b, m: init_quadric_svd(p, b, m, Kj, ROWS, COLS))(
        poses, bboxes, mask)
    assert bool(res.ok[0]) and bool(res.ok[1])
    for i, gt in enumerate(gts):
        assert np.allclose(np.asarray(res.ellipsoid[i][:3]), gt[:3], atol=0.05)


def test_incremental_matches_batch():
    """Host-side Gram-accumulated init equals the jitted SVD initializer."""
    from object_oriented_slam_tpu.init.svd_incremental import (
        IncrementalQuadricInit)
    gt = np.array([0.4, -0.3, 0.5, 0, 0, 0, 1, 0.45, 0.3, 0.2], np.float32)
    poses, bboxes = make_observations(gt, n_views=18, noise=0.5)
    mask = np.ones(len(poses), bool)

    res = init_quadric_svd(jnp.asarray(poses), jnp.asarray(bboxes),
                           jnp.asarray(mask), jnp.asarray(K), ROWS, COLS)
    assert bool(res.ok)
    batch = np.asarray(res.ellipsoid, np.float64)

    inc = IncrementalQuadricInit(K, ROWS, COLS)
    for p, b in zip(poses, bboxes):
        inc.add_observation(0, p, b)
    assert inc.n_planes(0) == int(res.n_planes)
    v = inc.try_init(0)
    assert v is not None
    # same math in f64 host form vs f32 device SVD: centers/scales agree
    assert np.allclose(v[:3], batch[:3], atol=2e-3), (v[:3], batch[:3])
    assert np.allclose(np.sort(v[7:]), np.sort(batch[7:]), atol=5e-3)
    assert np.allclose(v[:3], gt[:3], atol=0.05)

    # under the 9-plane gate nothing initializes
    inc2 = IncrementalQuadricInit(K, ROWS, COLS)
    for p, b in zip(poses[:2], bboxes[:2]):
        inc2.add_observation(0, p, b)
    assert inc2.try_init(0) is None
