"""Native C++ loader parity with cv2 and dataset integration."""
import glob
import os

import numpy as np
import pytest

from object_oriented_slam_tpu.io import native_loader as nl

CABINET = "/root/reference/Example/dataset/cabinet/"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(CABINET) and nl.native_available()),
    reason="native loader or dataset unavailable")


def test_depth_decode_bit_exact():
    import cv2
    for p in sorted(glob.glob(CABINET + "depth/*.png"))[:5]:
        got = nl.decode_depth(p)
        want = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert got is not None and np.array_equal(got, want)


def test_rgb_decode_matches_cv2():
    import cv2
    for p in sorted(glob.glob(CABINET + "rgb/*.jpg"))[:3]:
        got = nl.decode_rgb(p)
        want = cv2.imread(p, cv2.IMREAD_UNCHANGED)
        assert got is not None
        assert np.abs(got.astype(int) - want.astype(int)).mean() < 1.0


def test_prefetching_loader_sequential():
    dps = sorted(glob.glob(CABINET + "depth/*.png"))[:10]
    rps = sorted(glob.glob(CABINET + "rgb/*.jpg"))[:10]
    pl = nl.PrefetchingLoader(dps, rps, n_threads=2, lookahead=4)
    for i in range(10):
        out = pl.get(i)
        assert out is not None
        d, r = out
        assert d.shape == (480, 640) and r.shape == (480, 640, 3)
    pl.close()


def test_dataset_uses_native():
    from object_oriented_slam_tpu.io import TUMDataset
    ds = TUMDataset(CABINET, use_native=True)
    assert ds._native is not None
    out = ds.read_frame(0)
    assert out is not None
    _, _, depth, rgb = out
    ds_cv = TUMDataset(CABINET, use_native=False)
    _, _, depth_cv, rgb_cv = ds_cv.read_frame(0)
    assert np.array_equal(depth, depth_cv)
