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
    ap.add_argument("--obj-ring", default=None, metavar="LO,HI",
                    help="object-ring radius range, e.g. 1.5,1.9 spaces "
                         "8 objects ~1.3 m apart (the reference's "
                         "association gate is 1.0 m)")
    ap.add_argument("--optimal-assoc", action="store_true",
                    help="use the globally-optimal gated assignment "
                         "instead of the reference's greedy matching")
    ap.add_argument("--auto-assoc", action="store_true",
                    help="ignore the ground-truth instance column and let "
                         "DataAssociationSolver assign observations "
                         "(DataAssociation.cpp:90-135 semantics); reports "
                         "association accuracy against the hidden truth")
    ap.add_argument("--symmetry", action="store_true",
                    help="enable symmetry completion in depth mode")
    ap.add_argument("--json-line", action="store_true",
                    help="print a machine-readable summary line")
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
    ring = (tuple(float(v) for v in args.obj_ring.split(","))
            if args.obj_ring else (0.4, 1.5))
    scene = make_scene(n_objects=args.objects, seed=args.seed, camera=cam,
                       radius_range=ring)
    ds = SyntheticDataset(scene, n_frames=args.frames, orbit_radius=3.4,
                          height=1.6)

    extractor = plane_est = None
    if args.mode == "depth":
        from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                       make_extractor,
                                                       make_plane_estimator)
        extractor = make_extractor(cam, ExtractorConfig(
            cluster_min_size=30, open_symmetry=args.symmetry))
        plane_est = make_plane_estimator(cam)

    slam = System(YAML, extractor=extractor, plane_estimator=plane_est)
    if args.mode == "depth":
        slam.open_ground_plane_estimation()
    if args.optimal_assoc:
        slam.tracker.use_optimal_assoc = True

    rng = np.random.default_rng(args.seed + 1)
    gt_poses, in_poses = [], []
    frame_dets = {}
    drift = np.zeros(3)
    t0 = time.time()
    n = 0
    for i, ts, pose, depth, rgb, det in ds.frames():
        gt_poses.append(pose.copy())
        frame_dets[i] = np.asarray(det, np.float64).reshape(-1, 8)
        if args.slam:
            drift = drift + rng.normal(0, args.noise, 3)
            pose = pose.copy()
            pose[:3] += drift          # odometry-style accumulated error
        in_poses.append(pose.copy())
        slam.track_with_objects(ts, pose, det,
                                depth=depth if args.mode == "depth" else None,
                                with_association=not args.auto_assoc)
        n += 1
    slam.tracker.sync()
    dt = time.time() - t0
    gt_poses = np.stack(gt_poses)
    in_poses = np.stack(in_poses)

    gt_map = {k: scene.ellipsoids[k] for k in range(args.objects)}
    est_map = slam.map_objects

    # ---- association scoring (auto mode): recover the hidden truth by
    # matching each stored observation's bbox back to the frame's
    # detection rows, whose column 7 carries the true object index -----
    assoc_accuracy = None
    inst_to_gt = {k: k for k in est_map}
    if args.auto_assoc:
        votes = {}
        total = correct = 0
        for inst, rec in slam.tracker.state.objects.items():
            v = {}
            for fid, bb in zip(rec.obs2d_frame, rec.obs2d_bbox):
                det = frame_dets.get(fid)
                if det is None or not len(det):
                    continue
                gt = int(det[np.argmin(
                    np.abs(det[:, 1:5] - np.asarray(bb)).sum(axis=1)), 7])
                v[gt] = v.get(gt, 0) + 1
            votes[inst] = v
        for inst, v in votes.items():
            if not v:
                continue
            maj = max(v.values())
            correct += maj
            total += sum(v.values())
        assoc_accuracy = correct / total if total else 0.0
        inst_to_gt = {inst: max(v, key=v.get)
                      for inst, v in votes.items() if v}
        est_map = {inst_to_gt[i]: v for i, v in est_map.items()
                   if i in inst_to_gt}

    ious = object_map_iou(est_map, gt_map)
    n_cov = len(set(est_map) & set(gt_map))
    print(f"{n} frames in {dt:.1f}s ({n / dt:.2f} fps) | "
          f"initialized {len(est_map)} covering {n_cov}/{args.objects} "
          f"true objects")
    summ = timing_summary(slam.tracker.metrics)
    print("Timing:", summ)
    if assoc_accuracy is not None:
        print(f"association accuracy {assoc_accuracy:.3f} "
              f"({len(slam.tracker.state.objects)} instances for "
              f"{args.objects} objects)")
    print(f"{'inst':>4} {'IoU':>6} {'center err (m)':>15}")
    center_errs = []
    for inst in sorted(est_map):
        if inst not in gt_map:
            continue
        ce = float(np.linalg.norm(est_map[inst][:3] - gt_map[inst][:3]))
        center_errs.append(ce)
        print(f"{inst:>4} {ious.get(inst, 0.0):>6.3f} {ce:>15.3f}")
    mean_iou = float(np.mean(list(ious.values()))) if ious else 0.0
    med_ce = float(np.median(center_errs)) if center_errs else float("nan")
    if ious:
        print(f"mean IoU {mean_iou:.3f} | median center err {med_ce:.3f} m")
    if args.json_line:
        import json
        print(json.dumps({
            "eval": "synthetic_system",
            "objects": args.objects, "frames": n, "mode": args.mode,
            "auto_assoc": bool(args.auto_assoc),
            "optimal_assoc": bool(args.optimal_assoc),
            "obj_ring": list(ring),
            "symmetry": bool(args.symmetry),
            "assoc_accuracy": (round(assoc_accuracy, 4)
                               if assoc_accuracy is not None else None),
            "n_instances": len(slam.tracker.state.objects),
            "covered": n_cov,
            "mean_iou": round(mean_iou, 4),
            "median_center_err_m": round(med_ce, 4),
            "ms_per_frame_p50": round(summ.get("total_p50_ms", 0.0), 3),
            "fps": round(n / dt, 2)}))

    if args.slam:
        from object_oriented_slam_tpu.backend.lm import LMConfig
        from object_oriented_slam_tpu.system.slam_mode import run_slam_mode
        ate_in = ate_rmse(in_poses[:, :3], gt_poses[:, :3], align=False)
        poses_ref, obj_ref, chi2 = run_slam_mode(
            slam.tracker.state, slam.tracker.K, LMConfig(iters=10),
            odo_weight=1.0)
        ate_ref = ate_rmse(poses_ref[:len(gt_poses), :3], gt_poses[:, :3],
                           align=False)
        print(f"SLAM mode: input ATE {ate_in * 100:.2f} cm -> refined "
              f"{ate_ref * 100:.2f} cm (chi2 {chi2:.3g})")
        ious_ref = object_map_iou(obj_ref, gt_map)
        if ious_ref:
            print(f"refined mean IoU {np.mean(list(ious_ref.values())):.3f}")


if __name__ == "__main__":
    main()
