#!/usr/bin/env python
"""Cabinet SLAM-mode reference-iterate sweep (VERDICT r3 item 6).

Runs the full cabinet pipeline, corrupts the trajectory with random-walk
odometry noise, builds the SLAM-mode factor graph
(system/slam_mode.build_slam_graph — the reference's bSLAM_mode branch,
Optimizer.cpp:126-158), and compares backend/slam_ba.optimize_slam's f32
Schur/PCG iterates against the f64 numpy replica with numeric jacobians
and dense solves (tests/oracle_slam.py).  Prints JSON lines; the
tolerance-pinned synthetic version lives in tests/test_slam_oracle.py.

    python examples/oracle_slam_sweep.py [--iters 5] [--noise 0.01]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--noise", type=float, default=0.01)
    ap.add_argument("--odo-weight", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp
    import bench
    from object_oriented_slam_tpu.backend.lm import LMConfig
    from object_oriented_slam_tpu.backend import slam_ba
    from object_oriented_slam_tpu.io import TUMDataset
    from object_oriented_slam_tpu.system.slam_mode import build_slam_graph
    from oracle_slam import optimize_slam_np

    # ---- 1. full pipeline on the cabinet ----
    slam, cam, ext_cfg = bench.make_system()
    ds = TUMDataset(CABINET)
    for i, ts, pose, depth, rgb, det in ds.frames():
        slam.track_with_objects(ts, pose, det, depth=depth)
    slam.tracker.sync()
    state = slam.tracker.state
    print(json.dumps({"stage": "pipeline", "frames": len(state.frames_ts),
                      "objects": len(state.initialized_instances())}),
          flush=True)

    # ---- 2. corrupt the trajectory; odometry from the true motions ----
    rng = np.random.default_rng(args.seed)
    true_traj = np.stack(state.frames_pose_wc)
    noisy = true_traj.copy()
    walk = np.cumsum(rng.normal(0, args.noise, (len(noisy), 3)), axis=0)
    noisy[:, :3] += walk - walk[0]
    state.frames_pose_wc = [p for p in noisy]

    lm_cfg = LMConfig(iters=args.iters)
    g, instances = build_slam_graph(state, lm_cfg, max_frames=64,
                                    odometry_wc=true_traj,
                                    odo_weight=args.odo_weight)
    K = slam.tracker.K.astype(np.float64)
    normal = (state.ground_plane[:3] if state.ground_plane is not None
              else np.zeros(3))

    # ---- 3. unpack the graph into the oracle's edge lists ----
    def m(x):
        return np.asarray(x, np.float64)

    fm = np.asarray(g.frame_mask)
    om = np.asarray(g.obj_mask)
    edges = {"e2": [], "e3": [], "odo": [], "grav": []}
    for e in range(len(np.asarray(g.e2_w))):
        w = float(np.asarray(g.e2_w)[e])
        if w > 0:
            edges["e2"].append((int(np.asarray(g.e2_frame)[e]),
                                int(np.asarray(g.e2_obj)[e]),
                                m(g.e2_bbox[e]), w))
    for e in range(len(np.asarray(g.e3_w))):
        w = float(np.asarray(g.e3_w)[e])
        if w > 0:
            edges["e3"].append((int(np.asarray(g.e3_frame)[e]),
                                int(np.asarray(g.e3_obj)[e]),
                                m(g.e3_meas[e]), w))
    for e in range(len(np.asarray(g.odo_w))):
        w = float(np.asarray(g.odo_w)[e])
        i, j = int(np.asarray(g.odo_i)[e]), int(np.asarray(g.odo_j)[e])
        if w > 0 and fm[i] and fm[j]:
            edges["odo"].append((i, j, m(g.odo_meas[e]), w))
    for k in range(len(om)):
        w = float(np.asarray(g.grav_w)[k])
        if om[k] and w > 0:
            edges["grav"].append((k, normal / max(
                np.linalg.norm(normal), 1e-9), w))
    n_frames = int(fm.sum())
    n_obj = int(om.sum())
    print(json.dumps({"stage": "graph", "frames": n_frames,
                      "objects": n_obj,
                      "e2": len(edges["e2"]), "e3": len(edges["e3"]),
                      "odo": len(edges["odo"]),
                      "grav": len(edges["grav"])}), flush=True)

    # ---- 4. oracle (restricted to the masked prefix) ----
    t0 = time.time()
    poses_ref, objs_ref, trace = optimize_slam_np(
        m(g.poses_cw)[:n_frames], m(g.objects)[:n_obj], edges, K,
        iters=args.iters)
    t_oracle = time.time() - t0

    # ---- 5. production f32 path, both solvers ----
    K32 = jnp.asarray(K.astype(np.float32))
    n32 = jnp.asarray(np.asarray(normal, np.float32))
    chi2_0 = float(slam_ba._chi2(g.poses_cw, g.objects, g, K32, n32))
    out = {"stage": "compare", "iters": args.iters,
           "chi2_0_f32": chi2_0, "chi2_0_oracle": trace[0],
           "chi2_0_rel": abs(chi2_0 - trace[0]) / max(trace[0], 1e-12),
           "oracle_s": round(t_oracle, 1)}
    for banded in (False, True):
        t0 = time.time()
        poses_f, objs_f, chi2_f = slam_ba.optimize_slam(
            g, K32, n32, lm_cfg, cg_iters=64, banded=banded)
        poses_f = np.asarray(poses_f, np.float64)[:n_frames]
        objs_f = np.asarray(objs_f, np.float64)[:n_obj]
        dq = np.abs(np.abs(np.sum(poses_f[:, 3:] * poses_ref[:, 3:],
                                  axis=1)) - 1.0)
        key = "banded" if banded else "dense"
        out[key] = {
            "secs": round(time.time() - t0, 1),
            "pose_t_max_m": float(np.abs(poses_f[:, :3]
                                         - poses_ref[:, :3]).max()),
            "pose_q_align_max": float(dq.max()),
            "obj_max": float(np.abs(objs_f - objs_ref).max()),
            "chi2_final_f32": float(chi2_f),
            "chi2_final_oracle": trace[-1],
        }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
