"""Oracle-derived whole-run golden for the cabinet sequence
(VERDICT r2 weak item 4: the goldens were self-pinned round-1 outputs).

Runs the ENTIRE f64 oracle chain over the bundled sequence — per-frame
frontend oracle (tests/oracle_frontend.py, dual symmetry like the
label-28 demo) feeding the reference's observation stores, then the
full-edge-set f64 backend replica (bench.numpy_backend_frame: 2D
projection + 3D + gravity edges, numeric jacobians, 10 LM iterations)
on the final graph from the 3D-seeded initial estimate — and prints the
resulting world-frame vec10.  The value this produced on 2026-08-21 is
pinned in tests/test_golden_cabinet.py as the ORACLE golden: the TPU
system's final map must land within tolerance of the f64 chain's
optimum, not merely of its own past output.

Usage: python examples/oracle_golden.py   (CPU, ~4 min)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CABINET = "/root/reference/Example/dataset/cabinet/"


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import oracle_frontend as orc
    from bench import numpy_backend_frame, np_se3_mul
    from object_oriented_slam_tpu.core import plane as plane_mod
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import make_plane_estimator
    from object_oriented_slam_tpu.io import Config, TUMDataset

    cam = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6, scale=5000.0)
    cfg = Config("/root/reference/Example/param/TUM3.yaml")
    scale_3d = cfg.get_float("Optimizer.Edges.3DEllipsoid.Scale", 1.0)
    grav_scale = cfg.get_float("Optimizer.Edges.GravityPrior.Scale", 1.0)
    grav_on = cfg.get_int("Optimizer.Edges.GravityPrior.Open") == 1

    ds = TUMDataset(CABINET)
    frames = [f for f in ds.frames() if len(f[5])]

    # ground plane from frame 0 (latched to world, like the system);
    # use the f64 oracle extractor for a fully-oracle chain
    i0, ts0, pose0, depth0, _, _ = frames[0]
    plane_cam = orc.extract_ground_plane_oracle(depth0.astype(np.int64),
                                                cam)
    plane_w = np.asarray(plane_mod.transform(
        jnp.asarray(plane_cam.astype(np.float32)),
        jnp.asarray(pose0.astype(np.float32))), np.float64)

    obs2d, obs3d = [], []
    e_world_first = None
    for fi, (i, ts, pose, depth, rgb, det) in enumerate(frames):
        det = np.asarray(det, np.float64).reshape(-1, 8)
        bbox, label, prob = det[0, 1:5], int(det[0, 5]), float(det[0, 6])
        res = orc.estimate_local_ellipsoid(
            depth.astype(np.int64), bbox, label, pose, cam, plane_w,
            open_symmetry=True)
        obs2d.append((np.asarray(orc.mat_to_pose7(
            np.linalg.inv(orc.se3_mat(pose)))), bbox, prob))
        if res.ok:
            mw = np.r_[np_se3_mul(pose, res.e_local[:7]), res.e_local[7:]]
            obs3d.append((mw, res.prob * scale_3d))
            if e_world_first is None:
                e_world_first = res.e_world.copy()
        if fi % 10 == 0:
            print(f"frame {fi}/{len(frames)}", flush=True)

    normal = plane_w[:3] / np.linalg.norm(plane_w[:3])
    gravity = (normal, grav_scale) if grav_on else None
    K = np.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])
    est = numpy_backend_frame(e_world_first, obs2d, obs3d, gravity, K)
    print(json.dumps({
        "oracle_golden_vec10": [round(float(v), 4) for v in est],
        "n_obs2d": len(obs2d), "n_obs3d": len(obs3d),
        "sorted_scale": [round(float(v), 4) for v in np.sort(est[7:])]}))


if __name__ == "__main__":
    main()
