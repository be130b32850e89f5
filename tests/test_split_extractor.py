"""Host-clustered split extraction must match the monolithic extractor.

The split path (frontend/extractor.py SplitExtractor) runs stages (a)-(c)
as device phase A, the Euclidean clustering as a native C++ grid-hash
union-find on the host (native/src/cluster.cpp), and stages (e)-(h) +
symmetry as device phase B.  Reference semantics are unchanged
(EllipsoidExtractor.cpp:292-493); only the execution split differs, so
outputs must match the monolithic program exactly (same ops on the same
f32 inputs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.frontend.extractor import (
    ExtractorConfig, SplitExtractor, _select_cluster_np, make_extractor,
    make_split_extractor)
from object_oriented_slam_tpu.io.native_loader import (cluster_labels,
                                                       native_available)
from object_oriented_slam_tpu.ops import cluster as cl

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not native_available(),
                                reason="native library unavailable")]

CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
             width=640, height=480)
RNG = np.random.default_rng(17)


def _blobby_cloud(n, n_blobs=4, span=1.5, sigma=0.04):
    centers = RNG.uniform(-span, span, (n_blobs, 3))
    pts = np.concatenate([
        RNG.normal(c, sigma, (n // n_blobs, 3)) for c in centers])
    pts = np.concatenate([pts, RNG.uniform(-span, span,
                                           (n - len(pts), 3))])
    return pts.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_labels_match_exact_jax(seed):
    rng = np.random.default_rng(seed)
    n = 1024
    pts = _blobby_cloud(n)
    mask = rng.random(n) > 0.15
    for tol in (0.02, 0.08):
        lab_n = cluster_labels(pts, mask, tol)
        lab_j = np.asarray(cl.connected_components(
            jnp.asarray(pts), jnp.asarray(mask), tol, exact=True,
            outer_iters=64))
        np.testing.assert_array_equal(lab_n, lab_j)


def test_select_cluster_np_matches_device():
    n = 512
    pts = _blobby_cloud(n)
    mask = RNG.random(n) > 0.1
    labels = cluster_labels(pts, mask, 0.08)
    center = jnp.asarray(pts[RNG.integers(n)])
    for min_size, cdis in [(20, 0.5), (5, 0.2), (200, 0.5)]:
        sel_np, ok_np = _select_cluster_np(pts, mask, labels,
                                           np.asarray(center), min_size,
                                           cdis)
        sel_d, ok_d = cl.select_cluster(
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(labels),
            center, min_size, cdis)
        assert bool(ok_d) == ok_np
        np.testing.assert_array_equal(np.asarray(sel_d), sel_np)


def _scene():
    depth = np.zeros((480, 640), np.uint16)
    depth[100:300, 200:400] = (5000 + RNG.integers(0, 400,
                                                   (200, 200))).astype(
        np.uint16)
    # a second surface inside the bbox, farther away (separate cluster)
    depth[120:180, 210:260] = 9000
    return depth


@pytest.mark.parametrize("sym,sparse", [(False, False), (True, False),
                                        (True, True)])
def test_split_matches_monolithic(sym, sparse):
    depth = _scene()
    bboxes = np.array([[200, 100, 400, 300]], np.float64)
    labels = np.array([28])       # dual-symmetry label
    pose = np.array([0, 0, 0, 0, 0, 0, 1], np.float64)
    gp = np.array([0, -1, 0, 2.0], np.float64)
    cfg = ExtractorConfig(open_symmetry=sym, sparse_symmetry=sparse,
                          cloud_capacity=4096)
    mono = make_extractor(CAM, cfg)
    split = make_split_extractor(CAM, cfg)
    assert isinstance(split, SplitExtractor)

    m = np.asarray(mono(depth, bboxes, labels, pose, gp))
    s = np.asarray(split.midway(split(depth, bboxes, labels, pose, gp)))
    np.testing.assert_allclose(s, m, atol=1e-6)
    assert m[0, 11] > 0.5          # the scene must actually extract


@pytest.mark.parametrize("factory_name", ["split", "fused"])
def test_tracking_pipeline_with_split_extractor(factory_name):
    """Full tracker over a synthetic sequence: split/fused == monolithic
    maps, through the midway hook / fused result map, the deferral queue
    and sync()."""
    from object_oriented_slam_tpu.frontend.extractor import \
        make_fused_extractor
    from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,
                                                       make_scene)
    from object_oriented_slam_tpu.system import System
    alt_factory = (make_split_extractor if factory_name == "split"
                   else make_fused_extractor)

    scene = make_scene(n_objects=3, seed=9)
    cam = scene.camera
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        yaml = os.path.join(td, "s.yaml")
        with open(yaml, "w") as f:
            f.write("%YAML:1.0\n"
                    f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
                    f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
                    f"Camera.scale: {cam.scale}\n")

        def run(factory):
            cfg = ExtractorConfig(cluster_min_size=30, cloud_capacity=4096)
            slam = System(yaml, extractor=factory(cam, cfg),
                          plane_estimator=lambda d: np.array(
                              [0, -1, 0, 1e-3]))
            slam.open_ground_plane_estimation()
            for i, ts, pose, depth, rgb, det in SyntheticDataset(
                    scene, n_frames=24).frames():
                slam.track_with_objects(ts, pose, det, depth=depth)
            slam.tracker.sync()
            return slam.map_objects

        objs_m = run(make_extractor)
        objs_s = run(alt_factory)
    assert set(objs_s) == set(objs_m) and len(objs_m) >= 1
    # phase A/B are separate XLA programs, so fusion differs from the
    # monolithic graph by f32 round-off; 24 LM frames amplify that to
    # ~1e-5-1e-4 on the map.  1 mm is far below any semantic difference.
    for inst in objs_m:
        np.testing.assert_allclose(objs_s[inst], objs_m[inst], atol=1e-3)
