"""Aux subsystem tests: filters, dense builder, metrics, checkpoint, viz."""
import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.core.camera import Camera
from object_oriented_slam_tpu.ops import filters as fl
from object_oriented_slam_tpu.system import checkpoint as ckpt
from object_oriented_slam_tpu.system import metrics as mt
from object_oriented_slam_tpu.system.dense_builder import (DenseBuilder,
                                                           save_pcd, save_ply)
from object_oriented_slam_tpu.system.state import ObjectRecord, SlamState

RNG = np.random.default_rng(21)
CAM = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)


def test_statistical_outlier_removal():
    cloud = RNG.normal(0, 0.05, (200, 3)).astype(np.float32)
    cloud[:5] += 5.0  # gross outliers
    mask = np.ones(200, bool)
    inl = np.asarray(fl.statistical_outlier_mask(jnp.asarray(cloud),
                                                 jnp.asarray(mask), k=10))
    assert not inl[:5].any()
    assert inl[5:].mean() > 0.9


def test_points_inside_quadric():
    e = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1, 1, 0.5, 0.25], np.float32))
    pts = np.array([[0, 0, 0], [0.9, 0, 0], [0, 0.6, 0], [0, 0, 0.3]],
                   np.float32)
    m = np.ones(4, bool)
    got = np.asarray(fl.points_inside_quadric_mask(jnp.asarray(pts),
                                                   jnp.asarray(m), e))
    assert list(got) == [True, True, False, False]


def test_depth_border():
    depth = np.full((40, 40), 5000, np.uint16)
    depth[10:30, 10:30] = 2500  # closer block -> border ring
    b = np.asarray(fl.depth_border_mask(jnp.asarray(depth.astype(np.int32)),
                                        5000.0))
    assert b[10, 15] and b[29, 15]
    assert not b[20, 20]
    assert not b[5, 5]


def test_dense_builder_and_ply(tmp_path):
    b = DenseBuilder(CAM, leaf=0.05, stride=8, capacity=4096)
    depth = np.full((480, 640), int(2.0 * CAM.scale), np.uint16)
    rgb = np.full((480, 640, 3), 128, np.uint8)
    pose = np.array([0, 0, 0, 0, 0, 0, 1], np.float64)
    b.process_frame(rgb, depth, pose)
    pts, colors = b.get_map()
    assert len(pts) > 100
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.1
    p = str(tmp_path / "map.ply")
    b.save_ply(p)
    with open(p) as f:
        head = f.readline()
    assert head.strip() == "ply"
    # fusing the same frame again should not grow the map (same voxels)
    n1 = len(pts)
    b.process_frame(rgb, depth, pose)
    assert abs(len(b.get_map()[0]) - n1) < n1 * 0.05


def test_save_pcd_roundtrip(tmp_path):
    """PCD export matches the reference's save format (builder.cpp:121-125)."""
    pts = np.array([[1.0, 2.0, 3.0], [-0.5, 0.25, 4.0]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 128, 64]], np.float32)  # BGR rows
    p = str(tmp_path / "map.pcd")
    save_pcd(p, pts, rgb)
    with open(p) as f:
        lines = f.read().splitlines()
    hdr = {ln.split()[0]: ln.split()[1:] for ln in lines[1:10]}
    assert hdr["VERSION"] == ["0.7"]
    assert hdr["FIELDS"] == ["x", "y", "z", "rgb"]
    assert hdr["POINTS"] == ["2"]
    assert lines[10].startswith("DATA ascii")
    data = np.array([[float(v) for v in ln.split()] for ln in lines[11:]])
    assert np.allclose(data[:, :3], pts, atol=1e-3)
    # unpack PCL's packed-float rgb: row0 is BGR(255,0,0) = blue
    packed = data[:, 3].astype(np.float32).view(np.uint32)
    assert (packed[0] >> 16) & 0xFF == 0 and packed[0] & 0xFF == 255
    assert (packed[1] >> 8) & 0xFF == 128

    # xyz-only variant
    p2 = str(tmp_path / "bare.pcd")
    save_pcd(p2, pts)
    with open(p2) as f:
        txt = f.read()
    assert "FIELDS x y z\n" in txt


def test_ate_rmse():
    gt = RNG.normal(0, 1, (50, 3))
    est = gt + 0.01
    # unaligned: constant offset = 0.01*sqrt(3)
    assert abs(mt.ate_rmse(est, gt, align=False) - 0.01 * np.sqrt(3)) < 1e-6
    # aligned: ~0
    assert mt.ate_rmse(est, gt, align=True) < 1e-9
    # rotated+shifted trajectory aligns to ~0
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    est2 = gt @ R.T + np.array([1, 2, 3])
    assert mt.ate_rmse(est2, gt, align=True) < 1e-9


def test_checkpoint_roundtrip(tmp_path):
    st = SlamState()
    st.frames_pose_wc = [np.arange(7.0), np.arange(7.0) + 1]
    st.frames_ts = [1.0, 2.0]
    st.ground_plane = np.array([0, 0, 1.0, -0.5])
    st.ground_state = 2
    r = ObjectRecord(instance=3, label=28, initialized=True)
    r.vec10 = np.arange(10.0)
    r.obs2d_pose_cw = [np.arange(7.0)]
    r.obs2d_pose_wc = [np.arange(7.0)]
    r.obs2d_bbox = [np.array([1.0, 2, 3, 4])]
    r.obs2d_prob = [0.9]
    r.obs2d_frame = [0]
    st.objects[3] = r
    p = str(tmp_path / "ck.npz")
    ckpt.save_state(st, p)
    st2 = ckpt.load_state(p)
    assert st2.ground_state == 2
    assert np.allclose(st2.ground_plane, st.ground_plane)
    assert 3 in st2.objects
    r2 = st2.objects[3]
    assert r2.label == 28 and r2.initialized
    assert np.allclose(r2.vec10, r.vec10)
    assert np.allclose(r2.obs2d_bbox[0], [1, 2, 3, 4])
    assert r2.obs2d_prob == [0.9]


def test_viz_draw_frame(tmp_path):
    from object_oriented_slam_tpu.viz.export import draw_frame, draw_depth_frame
    rgb = np.zeros((480, 640, 3), np.uint8)
    det = np.array([[0, 100, 100, 200, 200, 28, 0.9, 0]])
    objs = {0: np.array([0, 0, 3, 0, 0, 0, 1, 0.5, 0.5, 0.5])}
    pose = np.array([0, 0, 0, 0, 0, 0, 1.0])
    img = draw_frame(rgb, det, objs, pose, CAM.K)
    assert img.sum() > 0
    depth = np.full((480, 640), 10000, np.uint16)
    d = draw_depth_frame(depth)
    assert d.shape == (480, 640, 3)


def test_cloud_lists_semantics():
    st = SlamState()
    a = np.zeros((10, 3))
    b = np.ones((5, 3))
    st.add_point_cloud_list("Extractor.ObjectPoints", a)
    st.add_point_cloud_list("Extractor.CenterPoints", b)
    st.add_point_cloud_list("Extractor.ObjectPoints", b, mode=1)  # append
    assert st.cloud_lists["Extractor.ObjectPoints"][0].shape == (15, 3)
    # partial-prefix delete (DeletePointCloudList partial matching)
    n = st.delete_point_cloud_list("Extractor.", partial=True)
    assert n == 2 and not st.cloud_lists


def test_loader_sequential_api():
    import os
    import pytest as _pytest
    cab = "/root/reference/Example/dataset/cabinet/"
    if not os.path.exists(cab):
        _pytest.skip("dataset unavailable")
    from object_oriented_slam_tpu.io import TUMDataset
    ds = TUMDataset(cab, use_native=False)
    assert len(ds.valid_indices()) == 58
    ds.set_current(55)
    n = 0
    while not ds.empty():
        out = ds.read_next()
        if out is None:
            break
        n += 1
    assert n == 3


def test_checkpoint_resume_equivalence(tmp_path):
    """Checkpoint at frame k, restore into a fresh System, continue: the
    final map must match an uninterrupted run (Tracking.restore_state)."""
    import os
    cabinet = "/root/reference/Example/dataset/cabinet/"
    if not os.path.exists(cabinet):
        import pytest
        pytest.skip("cabinet dataset unavailable")
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.system import System

    yaml = "/root/reference/Example/param/TUM3.yaml"
    frames = list(TUMDataset(cabinet).frames())

    def run(frame_iter, slam=None):
        if slam is None:
            slam = System(yaml)
        for i, ts, pose, depth, rgb, det in frame_iter:
            slam.track_with_objects(ts, pose, det)
        slam.tracker.sync()
        return slam

    full = run(frames)

    first = run(frames[:30])
    p = str(tmp_path / "mid.npz")
    ckpt.save_state(first.tracker.state, p)

    resumed = System(yaml)
    resumed.tracker.restore_state(ckpt.load_state(p))
    assert len(resumed.tracker.state.frames_ts) == 30
    resumed = run(frames[30:], slam=resumed)

    objs_f, objs_r = full.map_objects, resumed.map_objects
    assert set(objs_r) == set(objs_f)
    for inst in objs_f:
        assert np.allclose(objs_r[inst], objs_f[inst], atol=1e-5), \
            np.abs(objs_r[inst] - objs_f[inst]).max()
    # histories continue seamlessly
    hf = full.tracker.state.objects[0].history
    hr = resumed.tracker.state.objects[0].history
    assert len(hf) == len(hr)
    assert np.allclose(np.stack(hf), np.stack(hr), atol=1e-5)
