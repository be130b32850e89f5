"""Golden-regression on the cabinet minimum slice.

The reference ships no goldens (SURVEY.md section 4); this pins OUR
output so behavioral drift is caught: the 2D-only pipeline's final object
estimate on the bundled sequence must stay within tight bounds of the
recorded golden (values from the round-1 run, mean reprojection IoU 0.82).
"""
import os

import numpy as np
import pytest

from object_oriented_slam_tpu.io import TUMDataset, writers
from object_oriented_slam_tpu.system import System

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not os.path.exists(CABINET),
                                reason="cabinet dataset unavailable")]

# golden vec10 of instance 0 from the 2D-only slice (center/quat/scale)
GOLDEN_CENTER = np.array([-1.530, 0.462, 0.220])
GOLDEN_SCALE_SORTED = np.array([0.388, 0.425, 0.536])


def test_golden_2d_slice(tmp_path):
    ds = TUMDataset(CABINET)
    slam = System(YAML)
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det)
    v = slam.map_objects[0]
    assert np.allclose(v[:3], GOLDEN_CENTER, atol=0.05), v[:3]
    assert np.allclose(np.sort(v[7:]), GOLDEN_SCALE_SORTED, atol=0.06), v[7:]

    # aux writers exercise the remaining dump formats
    writers.save_bbox_with_association(str(tmp_path / "bbox"),
                                       slam.tracker.state)
    writers.save_observation_log(str(tmp_path / "obs.txt"),
                                 slam.tracker.state)
    files = os.listdir(tmp_path / "bbox")
    assert len(files) >= 40
    first = sorted(files)[0]
    with open(tmp_path / "bbox" / first) as f:
        parts = f.readline().split()
    assert len(parts) == 8  # n x1 y1 x2 y2 label prob instance
