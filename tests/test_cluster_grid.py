"""Grid-hash connected components (ops/cluster.py connected_components_grid).

The grid path must produce the SAME partition as the exact dense pass on
any voxel-downsampled cloud (its radius test is the identical f32
sum((p-q)^2) <= tol^2), and the extractor wired to it must reproduce the
dense-path extraction on real-shaped scenes.
"""
import collections

import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.ops import cluster as cl
from object_oriented_slam_tpu.ops import voxel as vx

RNG = np.random.default_rng(7)


def _partition(labels, mask):
    part = collections.defaultdict(set)
    for i in range(len(labels)):
        if mask[i]:
            part[int(labels[i])].add(i)
    return sorted(map(frozenset, part.values()))


def _grid_vs_exact(raw_pts, leaf, tol, capacity, drop=0):
    raw_mask = np.ones(len(raw_pts), bool)
    pts, cells, mask = vx.voxel_downsample_cells(
        jnp.asarray(raw_pts.astype(np.float32)), jnp.asarray(raw_mask),
        leaf, capacity)
    mask = np.array(mask)
    if drop:  # knock holes to exercise masked lanes
        occ = np.flatnonzero(mask)
        mask[RNG.choice(occ, size=min(drop, len(occ)), replace=False)] = False
    mask_j = jnp.asarray(mask)

    lab_g = np.asarray(cl.connected_components_grid(
        pts, cells, mask_j, tol, leaf, outer_iters=16))
    lab_e = np.asarray(cl.connected_components(
        pts, mask_j, tol, outer_iters=16, exact=True))
    assert _partition(lab_g, mask) == _partition(lab_e, mask)
    # label convention: component id = min original index
    np.testing.assert_array_equal(lab_g, lab_e)


def test_grid_matches_exact_blobs():
    pts = np.concatenate([
        RNG.normal([0, 0, 2.0], 0.05, (800, 3)),
        RNG.normal([0.5, 0.1, 2.5], 0.03, (600, 3)),
        RNG.uniform(-1, 1, (100, 3)) + [0, 0, 4.0]])
    _grid_vs_exact(pts, leaf=0.01, tol=0.02, capacity=2048, drop=60)


def test_grid_matches_exact_chains():
    # long thin chains at exactly-borderline spacing stress the stencil
    t = np.linspace(0, 1.2, 400)
    c1 = np.stack([t, 0.019 * np.sin(40 * t), np.full_like(t, 2.0)], 1)
    c2 = c1 + [0, 0.5, 0]
    bridge = np.array([[0.6, 0.25, 2.0]])
    pts = np.concatenate([c1, c2, bridge])
    _grid_vs_exact(pts, leaf=0.01, tol=0.02, capacity=1024)


def test_grid_matches_exact_uniform_dense():
    pts = RNG.uniform(0, 0.4, (3000, 3)) + [0, 0, 1.5]
    _grid_vs_exact(pts, leaf=0.01, tol=0.02, capacity=4096, drop=200)


def test_grid_noninteger_ratio():
    # tol/leaf = 2.5 -> R = 3 stencil is pruned out by grid_supported,
    # but the kernel itself must still be exact when invoked directly
    pts = RNG.normal([0, 0, 2.0], 0.04, (700, 3))
    _grid_vs_exact(pts, leaf=0.01, tol=0.018, capacity=1024)


def test_grid_supported_gate():
    assert cl.grid_supported(0.02, 0.01, 7.2)      # TUM defaults
    assert not cl.grid_supported(0.08, 0.01, 7.2)  # R=8 stencil too large
    assert not cl.grid_supported(0.02, 0.01, 11.0)  # span overflows packing


def test_extractor_grid_matches_dense():
    """Full extraction stage with grid clustering == dense clustering."""
    from object_oriented_slam_tpu.frontend import ExtractorConfig
    from object_oriented_slam_tpu.frontend.extractor import (
        _extract_packed, _grid_clustering_ok)
    from test_frontend import CAM, render_scene

    center = np.array([0.1, 0.4, 2.0])
    r = 0.3
    depth = render_scene(sphere_center=center, sphere_r=r)
    u = CAM.fx * center[0] / center[2] + CAM.cx
    v = CAM.fy * center[1] / center[2] + CAM.cy
    rad = CAM.fx * r / np.sqrt(center[2] ** 2 - r ** 2)

    pad = 1
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:4] = [u - rad, v - rad, u + rad, v + rad]
    flat[pad * 4] = 1.0
    flat[pad * 6 + 6] = 1.0  # identity quat w
    flat[pad * 6 + 7:] = [0.0, -1.0, 0.0, 0.8]

    cfg_g = ExtractorConfig(cluster_min_size=30, grid_cluster=True)
    cfg_d = ExtractorConfig(cluster_min_size=30)  # default: dense
    assert _grid_clustering_ok(CAM, cfg_g)
    assert not _grid_clustering_ok(CAM, cfg_d)

    out_g = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), CAM, cfg_g, pad, False, False))
    out_d = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), CAM, cfg_d, pad, False, False))
    assert out_g[0, 11] == 1.0  # valid
    # dense default pass uses the centered-expansion distance (+-3e-5 m
    # radius perturbation); any borderline-pair difference moves the PCA
    # inputs by at most a few points
    np.testing.assert_allclose(out_g, out_d, rtol=0, atol=1e-3)
