"""Flagship multi-object auto-association regression (VERDICT r2 item 2).

Drives the FULL system — 8 objects, 8 detections/frame, automatic
association (DataAssociation.cpp:90-135 semantics), symmetry completion
on — over a synthetic orbit and asserts association accuracy, coverage,
and map quality against thresholds measured on the TPU run
(BENCH_DETAILS.md round 3: accuracy 0.885, IoU 0.608, 10 instances).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                               make_extractor)
from object_oriented_slam_tpu.io.synthetic import SyntheticDataset, make_scene
from object_oriented_slam_tpu.system import System
from object_oriented_slam_tpu.system.metrics import object_map_iou

N_OBJ = 8


def _yaml(tmp_path, cam):
    p = tmp_path / "s.yaml"
    p.write_text("%YAML:1.0\n"
                 f"Camera.fx: {cam.fx}\nCamera.fy: {cam.fy}\n"
                 f"Camera.cx: {cam.cx}\nCamera.cy: {cam.cy}\n"
                 f"Camera.scale: {cam.scale}\n"
                 "Optimizer.Edges.3DEllipsoid.Scale: 10000\n"
                 "Optimizer.Edges.GravityPrior.Open: 0\n")
    return str(p)


def test_multiobject_auto_association(tmp_path):
    scene = make_scene(n_objects=N_OBJ, seed=7, radius_range=(1.5, 1.9))
    cam = scene.camera
    ds = SyntheticDataset(scene, n_frames=24, orbit_radius=3.4, height=1.6)

    cfg = ExtractorConfig(cluster_min_size=30, open_symmetry=True)
    slam = System(_yaml(tmp_path, cam),
                  extractor=make_extractor(cam, cfg),
                  plane_estimator=lambda d: np.array([0, -1, 0, 1e-3]))
    slam.open_ground_plane_estimation()

    frame_dets = {}
    for i, ts, pose, depth, rgb, det in ds.frames():
        frame_dets[i] = np.asarray(det, np.float64).reshape(-1, 8)
        slam.track_with_objects(ts, pose, det, depth=depth,
                                with_association=False)  # AUTO assoc
    slam.tracker.sync()

    # --- association accuracy: match stored observations back to the
    # detection rows, whose hidden column 7 carries the true object ---
    votes = {}
    for inst, rec in slam.tracker.state.objects.items():
        v = {}
        for fid, bb in zip(rec.obs2d_frame, rec.obs2d_bbox):
            det = frame_dets.get(fid)
            if det is None or not len(det):
                continue
            gt = int(det[np.argmin(
                np.abs(det[:, 1:5] - np.asarray(bb)).sum(axis=1)), 7])
            v[gt] = v.get(gt, 0) + 1
        if v:
            votes[inst] = v
    total = sum(sum(v.values()) for v in votes.values())
    correct = sum(max(v.values()) for v in votes.values())
    accuracy = correct / total
    n_instances = len(slam.tracker.state.objects)

    inst_to_gt = {inst: max(v, key=v.get) for inst, v in votes.items()}
    est_map = {inst_to_gt[i]: v for i, v in slam.map_objects.items()
               if i in inst_to_gt}
    gt_map = {k: scene.ellipsoids[k] for k in range(N_OBJ)}
    covered = len(set(est_map) & set(gt_map))
    ious = object_map_iou(est_map, gt_map)
    mean_iou = float(np.mean(list(ious.values())))
    center_errs = [float(np.linalg.norm(est_map[k][:3] - gt_map[k][:3]))
                   for k in est_map if k in gt_map]

    assert accuracy >= 0.80, f"association accuracy {accuracy:.3f}"
    assert covered >= N_OBJ - 1, f"covered {covered}/{N_OBJ}"
    assert n_instances <= N_OBJ + 5, f"{n_instances} instances"
    assert mean_iou >= 0.40, f"mean IoU {mean_iou:.3f}"
    assert float(np.median(center_errs)) < 0.15, center_errs
