#!/usr/bin/env python
"""Export a synthetic scene as a TUM RGB-D dataset directory.

Writes the exact on-disk layout the reference's loader (and io/tum.py)
consumes — rgb/ depth/ bbox/ groundtruth.txt associate.txt
associateGroundtruth.txt (formats per
/root/reference/src/tum_rgbd/io.cpp:156-290 and the bundled cabinet
sequence) — so the full CLI pipeline (examples/run_tum.py, including the
native decoder and --slam-mode/--odometry paths) can be exercised on
sequences beyond the single 58-frame cabinet demo:

    python examples/make_synthetic_tum.py /tmp/synth_seq \\
        --objects 12 --frames 48
    python examples/run_tum.py /root/reference/Example/param/TUM3.yaml \\
        /tmp/synth_seq --out /tmp/synth_run

``--odometry-noise`` additionally writes odometry.txt (a random-walk
corrupted trajectory in groundtruth format) for --odometry / SLAM-mode
evaluation; objects_gt.txt records the true quadrics for scoring.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def export_synthetic_tum(out_dir, scene, dataset, odometry_noise=0.0,
                         seed=2, depth_noise=0.0, bbox_jitter=0.0,
                         det_dropout=0.0):
    """Write ``dataset`` (io.synthetic.SyntheticDataset) to ``out_dir``.

    Corruption knobs (examples/noise_sweep.py):
      depth_noise  per-pixel gaussian sigma in METERS on valid depth
      bbox_jitter  gaussian sigma in PIXELS on every bbox corner
      det_dropout  probability of dropping each detection row
    Returns the number of frames written.
    """
    import cv2
    import numpy as np

    for sub in ("rgb", "depth", "bbox"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    rng = np.random.default_rng(seed)
    cam_scale = dataset.scene.camera.scale
    gt_rows, assoc_rows, agt_rows, odo_rows = [], [], [], []
    drift = np.zeros(3)
    n = 0
    for i, ts, pose, depth, rgb, det in dataset.frames():
        ts = 1000.0 + i / 30.0
        stem = f"{ts:.4f}"
        ts6 = f"{ts:.6f}"
        depth_arr = np.asarray(depth).astype(np.float64)
        if depth_noise > 0:
            valid = depth_arr > 0
            depth_arr = np.where(
                valid, depth_arr + rng.normal(
                    0, depth_noise * cam_scale, depth_arr.shape), 0.0)
        depth_u16 = np.clip(depth_arr, 0, 65535).astype(np.uint16)
        cv2.imwrite(os.path.join(out_dir, "depth", stem + ".png"),
                    depth_u16)
        if rgb is None:
            # flat gray with a depth-modulated channel so files are
            # nontrivial; the pipeline only needs rgb for viz/dense
            rgb8 = np.full(depth_u16.shape + (3,), 128, np.uint8)
            rgb8[..., 1] = (depth_u16 >> 8).astype(np.uint8)
        else:
            rgb8 = np.asarray(rgb, np.uint8)
        cv2.imwrite(os.path.join(out_dir, "rgb", stem + ".jpg"), rgb8)

        pose_str = " ".join(f"{v:.4f}" for v in pose)
        gt_rows.append(f"{stem} {pose_str}")
        assoc_rows.append(f"{ts6} rgb/{stem}.jpg {ts6} depth/{stem}.png")
        agt_rows.append(f"{ts6} rgb/{stem}.jpg {ts6} {pose_str}")
        if odometry_noise > 0:
            drift = drift + rng.normal(0, odometry_noise, 3)
            op = pose.copy()
            op[:3] += drift
            odo_rows.append(f"{stem} " + " ".join(f"{v:.4f}" for v in op))

        with open(os.path.join(out_dir, "bbox", stem + ".txt"), "w") as f:
            for row in np.asarray(det, np.float64).reshape(-1, 8):
                if det_dropout > 0 and rng.random() < det_dropout:
                    continue
                if bbox_jitter > 0:
                    row = row.copy()
                    row[1:5] += rng.normal(0, bbox_jitter, 4)
                    row[1:5] = np.clip(
                        row[1:5], 0,
                        [dataset.scene.camera.width - 1,
                         dataset.scene.camera.height - 1,
                         dataset.scene.camera.width - 1,
                         dataset.scene.camera.height - 1])
                f.write(" ".join(f"{v:.4f}" for v in row) + "\n")
        n += 1

    for name, rows in (("groundtruth.txt", gt_rows),
                       ("associate.txt", assoc_rows),
                       ("associateGroundtruth.txt", agt_rows)):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("\n".join(rows) + "\n")
    if odo_rows:
        with open(os.path.join(out_dir, "odometry.txt"), "w") as f:
            f.write("\n".join(odo_rows) + "\n")

    with open(os.path.join(out_dir, "objects_gt.txt"), "w") as f:
        for k, e in enumerate(np.asarray(dataset.scene.ellipsoids)):
            f.write(f"{k} " + " ".join(f"{v:.6f}" for v in e) + "\n")
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--objects", type=int, default=12)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--radius", type=float, default=3.4)
    ap.add_argument("--height", type=float, default=1.6)
    ap.add_argument("--odometry-noise", type=float, default=0.0,
                    help="per-frame random-walk translation noise (m); "
                         "writes odometry.txt when > 0")
    args = ap.parse_args()

    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.io.synthetic import (SyntheticDataset,
                                                       make_scene)

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0,
                 width=640, height=480)
    scene = make_scene(n_objects=args.objects, seed=args.seed, camera=cam)
    ds = SyntheticDataset(scene, n_frames=args.frames,
                          orbit_radius=args.radius, height=args.height)
    n = export_synthetic_tum(args.out_dir, scene, ds,
                             odometry_noise=args.odometry_noise)
    print(f"wrote {n} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
