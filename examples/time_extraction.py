"""A/B extraction-program timing on the device (steady state, one process).

Times the packed single-frame extraction program (_extract_packed) on a
real cabinet frame under several configs in ONE process — cross-process
timing comparisons are invalid on the tunneled device (per-hour latency
swings), so every variant is measured back-to-back here.

Usage:  python examples/time_extraction.py [--reps 40] [--frame 20]
"""
import argparse
import dataclasses
import time

import numpy as np


def time_variant(fn, reps):
    """Steady-state ms/call: warm past the remote service's slow first
    executions, then dispatch all reps and sync once via scalar fetch."""
    out = fn()
    float(np.asarray(out).sum())
    for _ in range(30):
        out = fn()
    float(np.asarray(out).sum())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        float(sum(np.asarray(o).sum() for o in outs))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--frame", type=int, default=20)
    ap.add_argument("--dataset",
                    default="/root/reference/Example/dataset/cabinet/")
    ap.add_argument("--grid", action="store_true",
                    help="also time the (TPU-pathological) grid-cluster "
                         "variants")
    ap.add_argument("--chains", default="3",
                    help="comma list of cluster_chains values to A/B "
                         "(e.g. '-1,1,3'; -1 = pre-round-5 single-seed)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import ExtractorConfig
    from object_oriented_slam_tpu.frontend.extractor import (
        _cloud_tier, _extract_packed)
    from object_oriented_slam_tpu.io import TUMDataset

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
    ds = TUMDataset(args.dataset)
    for i, ts, pose, depth, rgb, det in ds.frames():
        if i == args.frame and len(det):
            break
    bboxes = det[:, 1:5].astype(np.float32)
    print(f"frame {args.frame}: {len(bboxes)} detection(s)")

    pad = 1
    n = min(len(bboxes), pad)
    flat = np.zeros(pad * 6 + 11, np.float32)
    flat[:n * 4] = bboxes[:n].ravel()
    flat[pad * 4:pad * 4 + n] = 1.0
    flat[pad * 5:pad * 5 + n] = 2.0  # dual symmetry (cabinet label)
    flat[pad * 6:pad * 6 + 7] = pose
    # ground plane from the demo scene (world frame, normalized-ish)
    flat[pad * 6 + 7:] = [0.015, 0.006, 0.999, -0.316]

    depth_j = jnp.asarray(depth)
    flat_j = jnp.asarray(flat)
    tier = _cloud_tier(bboxes[:n], [True] * n, cam.height, cam.width, 16384)
    print(f"cloud tier: {tier}")

    variants = []
    for ch in [int(c) for c in args.chains.split(",")]:
        variants += [
            (f"dense+sym ch{ch}",
             ExtractorConfig(cloud_capacity=tier, grid_cluster=False,
                             open_symmetry=True, cluster_chains=ch),
             False, True),
            (f"dense ch{ch}",
             ExtractorConfig(cloud_capacity=tier, grid_cluster=False,
                             cluster_chains=ch), False, False),
        ]
    if args.grid:
        # grid-hash clustering: exact + asymptotically better but the
        # remote TPU toolchain compiles its gathers pathologically
        # (BENCH_DETAILS "grid clustering") — opt-in only
        variants += [
            ("grid+sym", ExtractorConfig(cloud_capacity=tier,
                                         grid_cluster=True,
                                         open_symmetry=True), False, True),
            ("grid", ExtractorConfig(cloud_capacity=tier, grid_cluster=True),
             False, False),
        ]
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))))
    from bench import roofline
    for name, cfg, ns, nd in variants:
        ms = time_variant(
            lambda cfg=cfg, ns=ns, nd=nd: _extract_packed(
                depth_j, flat_j, cam, cfg, pad, ns, nd), args.reps)
        jitted = _extract_packed.lower(depth_j, flat_j, cam, cfg, pad,
                                       ns, nd).compile()
        rl = roofline(jitted, ms) or {}
        print(f"{name:12s} {ms:7.2f} ms/call   "
              f"{rl.get('tflops_achieved', 0):8.4f} TF/s "
              f"(mfu {100 * rl.get('mfu', 0):.2f}%)   "
              f"{rl.get('gbps_achieved', 0):7.2f} GB/s "
              f"(bw {100 * rl.get('bw_util', 0):.1f}%)")


if __name__ == "__main__":
    main()
