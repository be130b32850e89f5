"""Noise-robustness regression at the pinned operating point
(VERDICT r3 item 7; curves: examples/noise_sweep.py).

Operating point: 2 cm depth noise + 2 px bbox jitter + 20 % detection
dropout, through the full on-disk TUM path (export -> io/tum.py loader
-> System).  Thresholds protect the gates/association against silent
regression; the reference ships no robustness evidence at all
(SURVEY.md §4).
"""
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))

YAML = "/root/reference/Example/param/TUM3.yaml"


def test_operating_point_thresholds(tmp_path):
    from noise_sweep import run_point_seeds
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.io.synthetic import make_scene

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
                 width=640, height=480)
    scene = make_scene(n_objects=4, seed=7, camera=cam,
                       radius_range=(1.3, 1.9))
    runs, agg = run_point_seeds(str(tmp_path), scene, cam, n_frames=24,
                                seeds=(2, 3, 4), depth_noise=0.02,
                                bbox_jitter=2.0, det_dropout=0.2)
    print("operating-point agg:", agg)
    # all objects recovered in every seed despite the corruption...
    assert agg["covered_min"] == agg["objects_gt"] == 4, (runs, agg)
    # ...with bounded SEED-MEDIAN error (a single-seed pin was hostage
    # to one bad draw — the round-4 dropout inversion; medians keep the
    # pin tight while hour-to-hour f32 jitter cannot flake it, and a
    # broken gate or association regression blows straight through).
    # Pins = ~3x the measured seed medians (p50 0.020 / max 0.028 /
    # IoU 0.82, 2026-08-22 — BENCH_DETAILS round 5)
    assert agg["center_p50_m_med"] < 0.06, agg
    assert agg["center_max_m_med"] < 0.10, agg
    assert agg["iou_mean_med"] > 0.55, agg
