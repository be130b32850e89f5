#!/usr/bin/env python
"""Synthetic-scene evaluation: object IoU / center error / ATE.

The reference ships no evaluation tooling beyond eyeballing the viewer
(SURVEY.md §4); this driver scores the recovered map against the true
quadrics of an analytically rendered scene (io/synthetic.py), and can
evaluate the SLAM mode by corrupting the input trajectory with
random-walk odometry noise and measuring ATE before/after the joint
pose+object optimization.

    python examples/eval_synthetic.py --objects 8 --frames 48 --mode depth
    python examples/eval_synthetic.py --slam --noise 0.01
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

YAML = os.environ.get(
    "OSLAM_YAML", "/root/reference/Example/param/TUM3.yaml")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=8)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--mode", choices=["2d", "depth"], default="2d")
    ap.add_argument("--slam", action="store_true",
                    help="corrupt input poses with odometry noise and "
                         "refine them with the SLAM-mode joint BA")
    ap.add_argument("--noise", type=float, default=0.01,
                    help="per-frame random-walk translation noise (m)")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    import numpy as np
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,
                                                       make_scene)
    from object_oriented_slam_tpu.system import System
    from object_oriented_slam_tpu.system.metrics import (ate_rmse,
                                                         object_map_iou,
                                                         timing_summary)

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
                 width=640, height=480)
    scene = make_scene(n_objects=args.objects, seed=args.seed, camera=cam)
    ds = SyntheticDataset(scene, n_frames=args.frames, orbit_radius=3.4,
                          height=1.6)

    extractor = plane_est = None
    if args.mode == "depth":
        from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                       make_extractor,
                                                       make_plane_estimator)
        extractor = make_extractor(cam, ExtractorConfig(cluster_min_size=30))
        plane_est = make_plane_estimator(cam)

    slam = System(YAML, extractor=extractor, plane_estimator=plane_est)
    if args.mode == "depth":
        slam.open_ground_plane_estimation()

    rng = np.random.default_rng(args.seed + 1)
    gt_poses, in_poses = [], []
    drift = np.zeros(3)
    t0 = time.time()
    n = 0
    for i, ts, pose, depth, rgb, det in ds.frames():
        gt_poses.append(pose.copy())
        if args.slam:
            drift = drift + rng.normal(0, args.noise, 3)
            pose = pose.copy()
            pose[:3] += drift          # odometry-style accumulated error
        in_poses.append(pose.copy())
        slam.track_with_objects(ts, pose, det,
                                depth=depth if args.mode == "depth" else None)
        n += 1
    slam.tracker.sync()
    dt = time.time() - t0
    gt_poses = np.stack(gt_poses)
    in_poses = np.stack(in_poses)

    gt_map = {k: scene.ellipsoids[k] for k in range(args.objects)}
    est_map = slam.map_objects
    ious = object_map_iou(est_map, gt_map)
    print(f"{n} frames in {dt:.1f}s ({n / dt:.2f} fps) | "
          f"initialized {len(est_map)}/{args.objects}")
    print("Timing:", timing_summary(slam.tracker.metrics))
    print(f"{'inst':>4} {'IoU':>6} {'center err (m)':>15}")
    for inst in sorted(est_map):
        ce = float(np.linalg.norm(est_map[inst][:3]
                                  - gt_map[inst][:3]))
        print(f"{inst:>4} {ious.get(inst, 0.0):>6.3f} {ce:>15.3f}")
    if ious:
        print(f"mean IoU {np.mean(list(ious.values())):.3f} | "
              f"median center err "
              f"{np.median([np.linalg.norm(est_map[i][:3] - gt_map[i][:3]) for i in est_map]):.3f} m")

    if args.slam:
        from object_oriented_slam_tpu.backend.lm import LMConfig
        from object_oriented_slam_tpu.system.slam_mode import run_slam_mode
        ate_in = ate_rmse(in_poses[:, :3], gt_poses[:, :3], align=False)
        poses_ref, obj_ref, chi2 = run_slam_mode(
            slam.tracker.state, slam.tracker.K, LMConfig(iters=10),
            max_frames=max(args.frames, 8), odo_weight=1.0)
        ate_ref = ate_rmse(poses_ref[:len(gt_poses), :3], gt_poses[:, :3],
                           align=False)
        print(f"SLAM mode: input ATE {ate_in * 100:.2f} cm -> refined "
              f"{ate_ref * 100:.2f} cm (chi2 {chi2:.3g})")
        ious_ref = object_map_iou(obj_ref, gt_map)
        if ious_ref:
            print(f"refined mean IoU {np.mean(list(ious_ref.values())):.3f}")


if __name__ == "__main__":
    main()
