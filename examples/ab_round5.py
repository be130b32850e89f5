"""Round-5 in-process A/Bs on the attached TPU (VERDICT r4 items 3, 4, 7).

One process (cross-process timing on the tunneled device is invalid —
CLAUDE.md): online pipeline passes, the 3/4-N compacted clustering tier
on the worst cabinet frames, and the offline protocol ladder
(monolithic vs split-exact vs split-quantized) against the online pass.
Prints one JSON line; results land in BENCH_DETAILS.md round 5.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

# ext-section ladder variants: fine (default, r5b: +5/16 & 7/16 rungs at
# a 1024-row pass block), coarse (the first-r5 2048-aligned ladder),
# half-N-only (pre-r5).  kwargs applied over the production config.
LADDERS = (("fine", {}),
           ("coarse", {"compact_rungs": (4, 6, 8, 12)}),
           ("halfN", {"compact_tiers": False}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=("all", "online", "ext", "offline"),
                    default="all", help="run a single section")
    ap.add_argument("--batch", type=int, nargs="+", default=[8],
                    help="offline batch size(s) — per-program overhead "
                         "amortizes as 2 programs per B frames")
    opt = ap.parse_args()

    import jax.numpy as jnp
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.system.offline import OfflineMapper

    frames = list(TUMDataset(bench.CABINET).frames())
    n = len(frames)
    out = {"n_frames": n}

    # ---- online passes (warm + 2 timed) ------------------------------
    t0 = time.perf_counter()
    slam_w, _, _, _ = bench.run_pipeline(frames)
    out["online_warm_s"] = round(time.perf_counter() - t0, 1)
    if opt.only in ("all", "online", "offline"):
        best = None
        for _ in range(2):
            _, pf, drain, per_call = bench.run_pipeline(frames)
            mean = (sum(pf) + drain) / n * 1e3
            if best is None or mean < best[0]:
                best = (mean, pf, per_call)
        mean, pf, per_call = best
        pf_ms = np.asarray(pf) * 1e3
        out["online_ms_mean"] = round(mean, 2)
        out["online_p50_ms"] = round(float(np.median(pf_ms)), 2)
        out["online_p90_ms"] = round(float(np.percentile(pf_ms, 90)), 2)
        out["online_frame0_ms"] = round(float(pf_ms[0]), 2)
        out["online_max_ms"] = round(float(pf_ms.max()), 2)
        out.update(bench.attribute_tail(pf_ms, per_call))

    if opt.only not in ("all", "ext"):
        if opt.only == "online":
            print(json.dumps(out))
            return
        return _offline(out, frames, OfflineMapper, opt.batch)

    # ---- compacted clustering ladder A/B ------------------------------
    # worst near-camera frames (measured 5.0-6.6k cluster-input survivors
    # at the 16384 tier) + frame 25 control
    from object_oriented_slam_tpu.frontend.extractor import (_extract_packed,
                                                             _pack_frame)
    _, cam, ext_cfg = bench.make_system()
    gp = slam_w.tracker.state.ground_plane
    for fid in (25, 37, 39, 41, 45):
        i, ts, pose, depth, rgb, det = frames[fid]
        det = np.asarray(det, np.float64).reshape(-1, 8)
        for tag, kw in LADDERS:
            cfg_v = dataclasses.replace(ext_cfg, **kw)
            h = _pack_frame(cam, cfg_v, depth, det[:, 1:5],
                            det[:, 5].astype(int), pose.astype(np.float32),
                            gp)
            args = (h.depth_j, jnp.asarray(h.flat), cam, h.cfg, h.pad,
                    h.need_s, h.need_d)
            outs = [_extract_packed(*args) for _ in range(12)]
            float(np.asarray(outs[-1]).sum())
            t0 = time.perf_counter()
            outs = [_extract_packed(*args) for _ in range(20)]
            float(np.asarray(outs[-1]).sum())
            key = f"ext_f{fid}_{tag}_ms"
            out[key] = round((time.perf_counter() - t0) / 20 * 1e3, 2)
            out[f"tier_f{fid}"] = h.cfg.cloud_capacity
        print(json.dumps({k: v for k, v in out.items()
                          if f"f{fid}" in k}), flush=True)

    if opt.only == "ext":
        print(json.dumps(out))
        return
    _offline(out, frames, OfflineMapper, opt.batch)


def _offline(out, frames, OfflineMapper, batches=(8,)):
    # ---- offline ladder ----------------------------------------------
    ms_keys = []

    def run_off(tag, B, **kw):
        slam_o, cam_o, cfg_o = bench.make_system()
        mapper = OfflineMapper(slam_o, cam_o, cfg_o, batch_size=B, **kw)
        mapper.run(iter(frames))                     # warm
        stats = None
        for _ in range(2):
            slam_o, cam_o, cfg_o = bench.make_system()
            mapper = OfflineMapper(slam_o, cam_o, cfg_o, batch_size=B, **kw)
            s = mapper.run(iter(frames))
            if stats is None or s["seconds"] < stats["seconds"]:
                stats = s
        sfx = "" if B == 8 else f"_b{B}"
        out[f"off_{tag}{sfx}_fps"] = round(stats["fps"], 2)
        key = f"off_{tag}{sfx}_ms"
        out[key] = round(stats["seconds"] / stats["frames"] * 1e3, 2)
        ms_keys.append(key)
        print(json.dumps({k: v for k, v in out.items()
                          if f"off_{tag}{sfx}_" in k}), flush=True)

    for B in batches:
        run_off("mono", B)
        run_off("split_exact", B, split=True, split_quant=False)
        run_off("split_quant", B, split=True, split_quant=True)
    out["off_best_vs_online"] = round(
        out["online_ms_mean"] / min(out[k] for k in ms_keys), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
