"""Oracle sweep: TPU frontend vs the f64 reference oracle over the FULL
58-frame cabinet sequence (VERDICT r2 item 5).

For every frame with a detection, runs the single-frame extraction both
ways — the batched TPU program (frontend/extractor.py) and the f64 numpy
replica of ``EstimateLocalEllipsoid`` + symmetry written from the C++
sources (tests/oracle_frontend.py) — in three variants (no symmetry,
single reflection, dual reflection), and reports the delta distributions
(center / scale / z-axis angle / symmetry probability).  Also compares
the ground-plane estimate against the f64 ``extractGroundPlane`` oracle.

Usage:  python examples/oracle_sweep.py [--variants none,single,dual]
                                        [--max-frames N] [--json OUT]

Run on CPU or TPU; the TPU side is the same jitted program the system
dispatches.  Results (2026-08) are recorded in BENCH_DETAILS.md and pin
the tolerances asserted by tests/test_reference_oracle.py.
"""
import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

CABINET = "/root/reference/Example/dataset/cabinet/"

# variants suffixed _numeric run the TPU side with the
# reference-faithful central-difference symmetry jacobians
# (ExtractorConfig.sym_analytic_grad=False) — quantifying the
# analytic-vs-numeric LM iterate gap across the sequence
VARIANT_SYM = {"none": 0, "single": 1, "dual": 2,
               "single_numeric": 1, "dual_numeric": 2}


def pipeline_extract(depth, bbox, pose, plane_w, sym_type, cam,
                     analytic=True):
    import jax.numpy as jnp
    from object_oriented_slam_tpu.frontend import ExtractorConfig
    from object_oriented_slam_tpu.frontend.extractor import _extract_packed
    cfg = ExtractorConfig(open_symmetry=sym_type > 0,
                          sym_analytic_grad=analytic)
    pad = 1
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:4] = bbox
    flat[pad * 4] = 1.0
    flat[pad * 5] = sym_type
    flat[pad * 6:pad * 6 + 7] = pose
    flat[pad * 6 + 7:] = plane_w
    out = np.asarray(_extract_packed(
        jnp.asarray(depth), jnp.asarray(flat), cam, cfg, pad,
        sym_type == 1, sym_type == 2), np.float64)[0]
    return out[:10], out[10], out[11] > 0.5


def z_axis_angle_deg(e_a, e_b):
    import oracle_frontend as orc
    za = orc.quat_to_mat(e_a[3:7])[:, 2]
    zb = orc.quat_to_mat(e_b[3:7])[:, 2]
    return math.degrees(math.acos(np.clip(abs(za @ zb), -1, 1)))


def pct(a, q):
    return float(np.percentile(a, q)) if len(a) else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="none,single,dual")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import oracle_frontend as orc
    import jax.numpy as jnp
    from object_oriented_slam_tpu.core import plane as plane_mod
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import make_plane_estimator
    from object_oriented_slam_tpu.io import TUMDataset

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
    ds = TUMDataset(CABINET)
    frames = [f for f in ds.frames() if len(f[5])]
    if args.max_frames:
        frames = frames[:args.max_frames]

    # ---- ground plane: TPU estimate (used by both sides, like the
    # system latches one plane) + oracle comparison on frame 0 ----------
    i0, ts0, pose0, depth0, _, _ = frames[0]
    est = make_plane_estimator(cam)
    plane_cam = np.asarray(est(depth0), np.float64)
    plane_w = np.asarray(plane_mod.transform(
        jnp.asarray(plane_cam.astype(np.float32)),
        jnp.asarray(pose0.astype(np.float32))), np.float64)

    plane_orc = orc.extract_ground_plane_oracle(depth0.astype(np.int64), cam)
    gp_stats = None
    if plane_orc is not None:
        n_o = plane_orc[:3] / np.linalg.norm(plane_orc[:3])
        n_t = plane_cam[:3] / np.linalg.norm(plane_cam[:3])
        gp_stats = {
            "normal_angle_deg": math.degrees(
                math.acos(np.clip(n_o @ n_t, -1, 1))),
            "origin_dist_delta_m": abs(
                plane_orc[3] / np.linalg.norm(plane_orc[:3])
                - plane_cam[3] / np.linalg.norm(plane_cam[:3])),
        }
    print("ground plane vs oracle:", gp_stats)

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    report = {"ground_plane": gp_stats, "variants": {}, "frames": len(frames)}
    for variant in variants:
        sym_type = VARIANT_SYM[variant]
        label = {0: 28, 1: 63, 2: 28}[sym_type]  # label drives the oracle
        d_center, d_sxy, d_sz, d_zdeg, d_prob = [], [], [], [], []
        n_ok = n_orc_fail = n_tpu_fail = 0
        t0 = time.time()
        for fi, (i, ts, pose, depth, rgb, det) in enumerate(frames):
            bbox = np.asarray(det, np.float64).reshape(-1, 8)[0, 1:5]
            res = orc.estimate_local_ellipsoid(
                depth.astype(np.int64), bbox, label, pose, cam, plane_w,
                open_symmetry=sym_type > 0)
            e_tpu, prob, valid = pipeline_extract(
                depth, bbox, pose, plane_w, sym_type, cam,
                analytic=not variant.endswith("_numeric"))
            if not res.ok:
                n_orc_fail += 1
                continue
            if not valid:
                n_tpu_fail += 1
                continue
            n_ok += 1
            eo = res.e_local
            d_center.append(float(np.linalg.norm(e_tpu[:3] - eo[:3])))
            d_sxy.append(float(np.max(np.abs(
                np.sort(e_tpu[7:9]) - np.sort(eo[7:9])))))
            d_sz.append(abs(float(e_tpu[9] - eo[9])))
            d_zdeg.append(z_axis_angle_deg(e_tpu, eo))
            d_prob.append(abs(float(prob - res.prob)))
            if fi % 10 == 0:
                print(f"  [{variant}] frame {fi}/{len(frames)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        stats = {}
        for name, arr in [("center_m", d_center), ("scale_xy_m", d_sxy),
                          ("scale_z_m", d_sz), ("z_axis_deg", d_zdeg),
                          ("prob", d_prob)]:
            stats[name] = {"p50": round(pct(arr, 50), 4),
                           "p90": round(pct(arr, 90), 4),
                           "max": round(pct(arr, 100), 4)}
        stats["n_ok"] = n_ok
        stats["n_oracle_fail"] = n_orc_fail
        stats["n_tpu_fail"] = n_tpu_fail
        report["variants"][variant] = stats
        print(f"[{variant}] {json.dumps(stats)}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
