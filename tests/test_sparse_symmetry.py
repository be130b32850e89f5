"""Sparse (border-weighted) symmetry estimation mode.

Reference behavior: ``Symmetry::SetBorders`` (src/symmetry/Symmetry.cpp:
163-167) switches the solver to mirror-and-score only the depth-border
cloud while the 1-NN reference set stays the full object cloud
(src/symmetry/SymmetrySolver.cpp:387-388 — ``pObjectCloud = mpBorders``
feeds ``GetSymmetryPointCloud``, but the KdTree is built on ``mpCloud``).
Inactive in the reference demo (``mbOpenSparseEstimation`` defaults false,
SymmetrySolver.cpp:41); here behind ``ExtractorConfig.sparse_symmetry``.

The scenario that motivates the mode: the depth sensor sees only one side
of the object, so the *interior* surface points are one-sided — mirroring
them across the true symmetry plane lands in empty (unobserved but
unoccluded) space and penalizes the true plane.  The *silhouette/border*
points trace the symmetric outline, so scoring only them recovers the
plane.
"""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend import symmetry as sym
from object_oriented_slam_tpu.ops import backproject as bp


CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
             width=640, height=480)


def _make_scene(rng, n_border=48, n_interior=96):
    """Cloud in the normalized object frame, symmetric border outline
    about the plane y=0 plus interior points only on the y<0 side."""
    # border: symmetric pairs (outline of the object)
    half = rng.uniform(-0.25, 0.25, size=(n_border // 2, 3)).astype(np.float32)
    half[:, 1] = np.abs(half[:, 1]) + 0.02          # y in [0.02, 0.27]
    border = np.concatenate([half, half * np.array([1, -1, 1], np.float32)])
    # interior: one-sided (visible face only)
    interior = rng.uniform(-0.25, 0.25, size=(n_interior, 3)).astype(np.float32)
    interior[:, 1] = -np.abs(interior[:, 1]) - 0.02  # y < 0 only

    S = 256
    pts = np.zeros((S, 3), np.float32)
    mask = np.zeros(S, bool)
    src = np.zeros(S, bool)
    n = n_border + n_interior
    pts[:n_border] = border
    pts[n_border:n] = interior
    mask[:n] = True
    src[:n_border] = True
    return jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(src)


def _run(pts, mask, src_mask):
    # camera 1.5 m behind the object along -z, axes aligned: everything
    # projects in front, nothing occluded (measured ray depth 10 m)
    pose_oc = jnp.asarray(np.array([0, 0, -1.5, 0, 0, 0, 1], np.float32))
    proj_depth = jnp.full((CAM.height, CAM.width), 10.0 * CAM.scale,
                          jnp.float32)
    bbox = jnp.asarray(np.array([0, 0, 639, 479], np.float32))
    return sym.estimate_symmetry(pts, mask, bbox, pose_oc, proj_depth, CAM,
                                 dual=False, src_mask=src_mask)


def test_sparse_recovers_plane_dense_does_not():
    rng = np.random.default_rng(3)
    pts, mask, src = _make_scene(rng)

    res_dense = _run(pts, mask, None)
    res_sparse = _run(pts, mask, src)

    # sparse: border outline is exactly symmetric about y=0 -> the
    # optimum is the zero-cost true plane
    plane = np.asarray(res_sparse.plane)
    plane = plane / np.linalg.norm(plane[:3])
    assert abs(abs(plane[1]) - 1.0) < 0.02          # normal ~ +-y
    assert abs(plane[3]) < 0.015                    # through y=0
    assert float(res_sparse.prob) > 0.9

    # dense: the one-sided interior points mirror into empty space and
    # penalize every candidate; the true plane can't reach high prob
    assert float(res_dense.prob) < float(res_sparse.prob) - 0.1


def test_sparse_cost_ignores_non_source_points():
    """With src_mask, moving a non-source point far away must not change
    the cost (it only serves as NN reference; here it is not the nearest
    neighbour of anything)."""
    rng = np.random.default_rng(7)
    pts, mask, src = _make_scene(rng)
    res0 = _run(pts, mask, src)

    pts2 = np.asarray(pts).copy()
    # move one interior (non-border) point outside the bbox projection
    idx = int(np.argmax(np.asarray(mask) & ~np.asarray(src)))
    pts2[idx] = [5.0, 5.0, 5.0]
    res1 = _run(jnp.asarray(pts2), mask, src)
    np.testing.assert_allclose(float(res0.error), float(res1.error),
                               atol=1e-5)


def test_bbox_pixel_lookup_aligns_with_point_grid():
    """bbox_pixel_lookup samples the same strided pixels as
    bbox_point_cloud, so attributes align row-for-row with points."""
    rng = np.random.default_rng(11)
    depth = np.zeros((480, 640), np.uint16)
    depth[50:200, 100:300] = 5000
    attr = rng.random((480, 640)).astype(np.float32)
    bbox = jnp.asarray(np.array([100, 50, 300, 200], np.float32))

    pts, m = bp.bbox_point_cloud(jnp.asarray(depth.astype(np.int32)), bbox,
                                 CAM, 6.0)
    a = np.asarray(bp.bbox_pixel_lookup(jnp.asarray(attr), bbox))

    pts = np.asarray(pts)
    m = np.asarray(m)
    # recover each valid point's pixel and check the attr matches
    z = pts[m][:, 2]
    u = np.rint(pts[m][:, 0] * CAM.fx / z + CAM.cx).astype(int)
    v = np.rint(pts[m][:, 1] * CAM.fy / z + CAM.cy).astype(int)
    np.testing.assert_allclose(a[m], attr[v, u], rtol=1e-6)


def test_extractor_sparse_flag_end_to_end():
    """The sparse_symmetry config flag runs end-to-end and still returns a
    valid estimate on a simple box scene."""
    import dataclasses
    from object_oriented_slam_tpu.frontend.extractor import (
        ExtractorConfig, extract_local_ellipsoids)
    depth = np.zeros((480, 640), np.uint16)
    depth[100:300, 200:400] = 5000
    e_args = dict(
        depth=jnp.asarray(depth.astype(np.int32)),
        bboxes=jnp.asarray(np.array([[200, 100, 400, 300]], np.float32)),
        run_mask=jnp.asarray(np.array([True])),
        pose_wc=jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1], np.float32)),
        ground_plane=jnp.asarray(np.array([0, -1, 0, 2.0], np.float32)),
        sym_types=jnp.asarray(np.array([1], np.int32)))
    cfg = ExtractorConfig(open_symmetry=True, sparse_symmetry=True,
                          cloud_capacity=2048)
    e, p, v, _ = extract_local_ellipsoids(
        cam=CAM, cfg=cfg, need_single=True, need_dual=False, **e_args)
    assert bool(np.asarray(v)[0])
    assert np.all(np.isfinite(np.asarray(e)))
