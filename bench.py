"""Benchmark: END-TO-END per-frame time on the cabinet workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Headline metric (``e2e_ms_per_frame``): the full 58-frame TUM
fr3_cabinet pipeline — ground-plane estimation, per-detection ellipsoid
extraction with symmetry completion, association, SVD/3D init, and the
per-frame global object-graph BA — i.e. the reference's whole
``Tracking::GrabPoseAndObjects`` hot path
(/root/reference/src/core/Tracking.cpp:170-204), timed as a second
(warm) pass over the sequence on the attached device.

Baseline (``vs_baseline``): **the f64 single-thread numpy replica of
the reference pipeline, NOT the reference's C++ binary** (which cannot
be built in this image — no Eigen/PCL; a C++ build would be roughly an
order of magnitude faster than numpy, so never quote these multipliers
as vs-C++ numbers; the JSON carries a ``baseline_kind`` field saying
the same).  Concretely: the float64 oracle chain on this machine's
CPU — the numpy frontend replica of EstimateLocalEllipsoid + symmetry
(tests/oracle_frontend.py, written from the C++ sources) timed on
sample frames, plus a full-edge-set f64 backend replica (2D projection
+ 3D ellipsoid + gravity edges, g2o-style numeric jacobians and dense
solves) timed at sampled graph sizes and integrated over the per-frame
graph growth the reference would rebuild every frame
(src/core/Optimizer.cpp:106-291).  The reference's own C++/PCL/g2o
stack cannot be built in this image; the replica matches its per-frame
flop structure.

Secondary metric (``backend_ba_ms_per_frame``): the production-shape
backend call alone — the tracker's tiered pack with 2D + 3D + gravity
edges exactly as the loop dispatches it every frame — against the same
f64 replica on the final graph.  Roofline fields (XLA cost analysis vs
v5e peaks) are reported for BOTH device programs (extraction and LM).
"""
import json
import os
import sys
import time

import numpy as np

CABINET = "/root/reference/Example/dataset/cabinet/"
YAML = "/root/reference/Example/param/TUM3.yaml"

# e2e p90 operating point (ms) pinned from the round-4 driver bench
# (40.2 ms); tests/test_bench_guard.py flags any recorded bench whose
# p90 exceeds 2x this pin.
E2E_P90_PIN_MS = 40.0

# --------------------------------------------------------------------------
# f64 numpy geometry (g2o-equivalent; quat [x,y,z,w], tangent [omega,ups])
# --------------------------------------------------------------------------


def np_quat_to_mat(q):
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def np_se3_mat(p):
    M = np.eye(4)
    M[:3, :3] = np_quat_to_mat(p[3:])
    M[:3, 3] = p[:3]
    return M


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


def _mat_to_quat(m):
    t = np.trace(m)
    q = np.array([m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1],
                  1.0 + t])
    if q[3] <= 1e-8:  # fallback branch
        i = int(np.argmax(np.diag(m)))
        q = np.roll(np.array([1 + 2 * m[i, i] - t,
                              m[(i + 1) % 3, i] + m[i, (i + 1) % 3],
                              m[(i + 2) % 3, i] + m[i, (i + 2) % 3],
                              m[(i + 2) % 3, (i + 1) % 3]
                              - m[(i + 1) % 3, (i + 2) % 3]]), i)
    return q / np.linalg.norm(q)


def np_mat_to_pose7(T):
    return np.r_[T[:3, 3], _mat_to_quat(T[:3, :3])]


def np_se3_mul(a, b):
    return np_mat_to_pose7(np_se3_mat(a) @ np_se3_mat(b))


def np_se3_inv(a):
    return np_mat_to_pose7(np.linalg.inv(np_se3_mat(a)))


def np_so3_log(q):
    qv = q[:3]
    n = np.linalg.norm(qv)
    w = np.clip(q[3], -1.0, 1.0)
    if n < 1e-12:
        return np.zeros(3)
    theta = 2.0 * np.arctan2(n, w)
    if theta > np.pi:
        theta -= 2 * np.pi
    return qv / n * theta


def np_se3_log(p):
    omega = np_so3_log(p[3:] / np.linalg.norm(p[3:]))
    th = np.linalg.norm(omega)
    Om = _skew(omega)
    if th < 1e-6:
        Vinv = np.eye(3) - 0.5 * Om + Om @ Om / 12.0
    else:
        c = (1 - 0.5 * th * np.cos(0.5 * th) / np.sin(0.5 * th)) / (th * th)
        Vinv = np.eye(3) - 0.5 * Om + c * (Om @ Om)
    return np.r_[omega, Vinv @ p[:3]]


def np_exp_update(vec10, u):
    # SE3 exp (omega, upsilon) + additive scale (VertexEllipsoid oplus,
    # BasicEllipsoidEdges.cpp:8-11)
    omega, ups, ds = u[:3], u[3:6], u[6:]
    th = np.linalg.norm(omega)
    if th < 1e-10:
        R = np.eye(3) + _skew(omega)
        V = np.eye(3)
    else:
        K_ = _skew(omega / th)
        R = np.eye(3) + np.sin(th) * K_ + (1 - np.cos(th)) * K_ @ K_
        V = (np.eye(3) + (1 - np.cos(th)) / th * K_
             + (th - np.sin(th)) / th * K_ @ K_)
    M = np.eye(4)
    M[:3, :3] = R
    M[:3, 3] = V @ ups
    Mn = np_se3_mat(vec10[:7]) @ M
    return np.r_[np_mat_to_pose7(Mn), vec10[7:] + ds]


def np_project_bbox(vec10, pose_cw, K):
    """Conic-projection bbox (Ellipsoid.cpp:209-273)."""
    s = vec10[7:]
    Qc = np.diag(np.r_[s * s, -1.0])
    T = np_se3_mat(vec10[:7])
    Qs = T @ Qc @ T.T
    P = K @ np_se3_mat(pose_cw)[:3, :]
    C = np.linalg.inv(P @ Qs @ P.T)
    C = C / C[2, 2]
    a, b, c = C[0, 0], C[0, 1] * 2, C[1, 1]
    d, e = C[0, 2] * 2, C[2, 1] * 2
    den = 4 * a * c - b * b
    x_c = (b * e - 2 * c * d) / den
    y_c = (b * d - 2 * a * e) / den
    quad = a * x_c * x_c + c * y_c * y_c + b * x_c * y_c - 1
    root = np.sqrt((a - c) ** 2 + b * b)
    a2 = max(2 * quad / (a + c + root), 0.0)
    b2 = max(2 * quad / (a + c - root), 0.0)
    th = 0.5 * np.arctan2(b, a - c)
    c2 = np.cos(th) ** 2
    s2 = 1 - c2
    xl = np.sqrt(a2 * c2 + b2 * s2)
    yl = np.sqrt(a2 * s2 + b2 * c2)
    return np.array([x_c - xl, y_c - yl, x_c + xl, y_c + yl])


def np_rotate_yaw(vec10, k):
    """Ellipsoid.cpp:75-90: body-frame z yaw by k*90deg, axes swapped."""
    yaw = k * np.pi / 2.0
    rot = np.array([0, 0, 0, 0, 0, np.sin(yaw / 2), np.cos(yaw / 2)])
    pose = np_se3_mul(vec10[:7], rot)
    s = vec10[7:]
    if k % 2 != 0:
        s = np.array([s[1], s[0], s[2]])
    return np.r_[pose, s]


def np_min_log_error_9dof(e, other):
    """Ellipsoid.cpp:92-117: min over {-90,0,90,180}deg yaw of other."""
    best, best_n = None, np.inf
    for k in (-1, 0, 1, 2):
        o = np_rotate_yaw(other, k)
        pose_diff = np_se3_mul(np_se3_inv(o[:7]), e[:7])
        r = np.r_[np_se3_log(pose_diff), e[7:] - o[7:]]
        n = r @ r
        if n < best_n:
            best, best_n = r, n
    return best


def np_residual_gravity(vec10, normal):
    """BasicEllipsoidEdges.cpp:129-152."""
    R = np_quat_to_mat(vec10[3:7])
    z = R[:, 2]
    cosang = z @ normal / (np.linalg.norm(z)
                           * max(np.linalg.norm(normal), 1e-8))
    return np.array([np.arccos(np.clip(cosang, -1 + 1e-4, 1 - 1e-4))])


# --------------------------------------------------------------------------
# f64 full-edge-set backend replica (the per-frame global BA the reference
# rebuilds every frame: Optimizer.cpp:83-317, numeric jacobians, 10 LM
# iterations, dense solve)
# --------------------------------------------------------------------------


def numpy_backend_frame(vec10, obs2d, obs3d, gravity, K, iters=10):
    """One frame of reference-style backend for one object.

    obs2d: list of (pose_cw7, bbox4, prob) — info = I4 * prob
    obs3d: list of (meas_world_vec10, prob*scale_3d) — the measured local
           ellipsoid transformed to world (estimate-independent)
    gravity: None or (normal3, gravity_scale)
    """
    est = vec10.copy()

    def residuals(e):
        rs = []
        for p, b, pr in obs2d:
            proj = np_project_bbox(e, p, K)
            rs.append(np.where(b >= 5, proj - b, 0.0) * np.sqrt(pr))
        for mw, w in obs3d:
            rs.append(np_min_log_error_9dof(e, mw) * np.sqrt(w))
        if gravity is not None:
            rs.append(np_residual_gravity(e, gravity[0]) * gravity[1])
        return np.concatenate(rs) if rs else np.zeros(0)

    lam, nu = -1.0, 2.0
    r = residuals(est)
    if r.size == 0:
        return est
    chi2 = r @ r
    for _ in range(iters):
        # central-difference jacobian (g2o numeric diff; 1e-6 for f64)
        J = np.zeros((r.size, 9))
        h = 1e-6
        for k in range(9):
            u = np.zeros(9)
            u[k] = h
            rp = residuals(np_exp_update(est, u))
            u[k] = -h
            rm = residuals(np_exp_update(est, u))
            J[:, k] = (rp - rm) / (2 * h)
        r = residuals(est)
        H = J.T @ J
        g = J.T @ r
        if lam < 0:
            lam = 1e-5 * np.max(np.diag(H))
        du = -np.linalg.solve(H + lam * np.eye(9), g)
        est_new = np_exp_update(est, du)
        r_new = residuals(est_new)
        chi2_new = r_new @ r_new
        if np.isfinite(chi2_new) and chi2_new < chi2:
            est, chi2, r = est_new, chi2_new, r_new
            lam *= 1.0 / 3.0
            nu = 2.0
        else:
            lam *= nu
            nu *= 2.0
    return est


# --------------------------------------------------------------------------

# TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM.  The workload is f32, so MFU against the bf16 peak is the
# conservative bound.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def roofline(compiled, ms_per_call, prefix=""):
    """FLOPs / HBM bytes of a compiled program from XLA's cost analysis,
    turned into achieved TFLOP/s, GB/s and utilization fractions.

    For this workload the honest story is: latency-bound tiny tensors —
    single-digit-% utilization at best; these numbers exist to say that
    with data rather than to claim MXU saturation.
    """
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
    except Exception:
        return {}
    if flops <= 0 and byts <= 0:
        return {}
    t = ms_per_call / 1e3
    return {
        prefix + "flops": flops,
        prefix + "hbm_bytes": byts,
        prefix + "tflops_achieved": round(flops / t / 1e12, 4),
        prefix + "gbps_achieved": round(byts / t / 1e9, 2),
        prefix + "mfu": round(flops / t / V5E_PEAK_FLOPS, 6),
        prefix + "bw_util": round(byts / t / V5E_PEAK_BW, 4),
    }


def make_system():
    """Build the production System exactly like examples/run_tum.py
    defaults: mono extractor, symmetry per the yaml, ground plane on."""
    from object_oriented_slam_tpu.core.camera import Camera
    from object_oriented_slam_tpu.frontend import (ExtractorConfig,
                                                   make_extractor,
                                                   make_plane_estimator)
    from object_oriented_slam_tpu.io import Config
    from object_oriented_slam_tpu.system import System

    cfg = Config(YAML)
    cam = Camera(fx=cfg.get_float("Camera.fx"), fy=cfg.get_float("Camera.fy"),
                 cx=cfg.get_float("Camera.cx"), cy=cfg.get_float("Camera.cy"),
                 scale=cfg.get_float("Camera.scale"),
                 width=cfg.get_int("Camera.width", 640),
                 height=cfg.get_int("Camera.height", 480))
    ext_cfg = ExtractorConfig(
        depth_range=cfg.read_value("EllipsoidExtractor_DEPTH_RANGE", 6.0),
        cluster_tolerance=cfg.get_float(
            "EllipsoidExtraction.Euclidean.ClusterTolerance", 0.02),
        cluster_min_size=cfg.get_int(
            "EllipsoidExtraction.Euclidean.MinClusterSize", 100),
        cluster_center_dis=cfg.get_float(
            "EllipsoidExtraction.Euclidean.CenterDis", 0.5),
        sym_grid=cfg.get_float("EllipsoidExtraction.Symmetry.GridSize", 0.1),
        open_symmetry=cfg.get_int("EllipsoidExtraction.Symmetry.Open") == 1)
    slam = System(YAML, extractor=make_extractor(cam, ext_cfg),
                  plane_estimator=make_plane_estimator(cam))
    slam.open_ground_plane_estimation()
    return slam, cam, ext_cfg


def run_pipeline(frames):
    """One pass of the full pipeline.

    Returns (slam, per-frame seconds, drain seconds, per-call stage
    breakdown).  The breakdown attributes each wall-clock grab call's
    time to the stages actually paid INSIDE that call (deferred
    processing bills to the call that ran it, not the frame it belongs
    to) — the data the tail-cause attribution needs (VERDICT r4 #2).
    """
    slam, _, _ = make_system()
    m = slam.tracker.metrics
    stage_keys = ("dispatch", "fetch", "host", "backend", "plane_wait")
    per_frame, per_call = [], []
    for i, ts, pose, depth, rgb, det in frames:
        pre = {k: len(m[k]) for k in stage_keys}
        t0 = time.perf_counter()
        slam.track_with_objects(ts, pose, det, depth=depth, rgb=None)
        per_frame.append(time.perf_counter() - t0)
        per_call.append({k: sum(m[k][pre[k]:]) for k in stage_keys})
    t0 = time.perf_counter()
    slam.tracker.sync()
    drain = time.perf_counter() - t0
    return slam, per_frame, drain, per_call


def attribute_tail(pf_ms, per_call):
    """Name the dominant cause of the worst frame (e2e_max_cause).

    The tracker's "host" stage spans the whole deferred processing
    (fetch and backend included), so the exclusive components compared
    are dispatch / fetch / backend / host-minus-both.
    """
    fid = int(np.argmax(pf_ms))
    comp = dict(per_call[fid])
    pw = comp.pop("plane_wait", 0.0)
    total_known = (comp["dispatch"] + comp["host"] + pw) * 1e3
    comp["host"] = max(comp["host"] - comp["fetch"] - comp["backend"], 0.0)
    comp["plane_wait"] = pw
    dom = max(comp, key=comp.get)
    dom_ms = comp[dom] * 1e3
    if dom == "plane_wait":
        cause = "plane-resolve-wait"
    elif dom == "fetch":
        cause = "blocked-fetch"
    elif dom == "backend":
        cause = "backend-dispatch-stall"
    elif dom == "dispatch":
        cause = "ground-plane-oneshot" if fid == 0 else "dispatch-stall"
    else:
        cause = "host-processing"
    if dom_ms > 1000.0:
        cause += "(likely-compile)"
    unattr = float(pf_ms[fid]) - total_known
    if unattr > max(dom_ms, 0.3 * float(pf_ms[fid])):
        cause = "untracked-host-stage"
    return {"e2e_max_frame": fid,
            "e2e_max_cause": cause,
            "e2e_max_dispatch_ms": round(comp["dispatch"] * 1e3, 2),
            "e2e_max_fetch_ms": round(comp["fetch"] * 1e3, 2),
            "e2e_max_host_ms": round(comp["host"] * 1e3, 2),
            "e2e_max_backend_ms": round(comp["backend"] * 1e3, 2),
            "e2e_max_plane_wait_ms": round(pw * 1e3, 2)}


def baseline_frontend_ms(frames, ground_plane_w, cam, ext_cfg,
                         sample_ids=(10, 25, 40)):
    """f64 oracle frontend (tests/oracle_frontend.py) timed on sample
    frames; returns mean ms per frontend call."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    import oracle_frontend as orc

    times = []
    for fid in sample_ids:
        i, ts, pose, depth, rgb, det = frames[fid]
        det = np.asarray(det, np.float64).reshape(-1, 8)
        t0 = time.perf_counter()
        for row in det:
            orc.estimate_local_ellipsoid(
                depth.astype(np.float64), row[1:5], int(row[5]), pose, cam,
                ground_plane_w, open_symmetry=ext_cfg.open_symmetry,
                depth_range=ext_cfg.depth_range,
                cluster_tol=ext_cfg.cluster_tolerance,
                cluster_min_size=ext_cfg.cluster_min_size,
                center_dis=ext_cfg.cluster_center_dis,
                sym_grid=ext_cfg.sym_grid)
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.mean(times)), times


def baseline_backend_model(slam, K, n_frames):
    """Time the f64 full-edge replica at sampled graph sizes, fit cost
    linear in edge count, integrate over the per-frame graph growth the
    reference would re-optimize every frame.

    Returns (mean ms/frame over the sequence, ms at the final graph).
    """
    lm_cfg = slam.tracker.lm_cfg
    gp = slam.tracker.state.ground_plane
    normal = None
    if gp is not None and lm_cfg.gravity_on:
        normal = gp[:3] / np.linalg.norm(gp[:3])

    # assemble the final graph per object (world-frame 3D measurements
    # are estimate-independent: precompute like the reference's
    # setMeasurement + transform_from)
    objs = []
    for inst, rec in slam.tracker.state.objects.items():
        if not rec.initialized:
            continue
        obs2d = [(np.asarray(p, np.float64), np.asarray(b, np.float64),
                  float(pr)) for p, b, pr in
                 zip(rec.obs2d_pose_cw, rec.obs2d_bbox, rec.obs2d_prob)]
        obs3d = []
        for p_wc, meas, pr in zip(rec.obs3d_pose_wc, rec.obs3d_meas,
                                  rec.obs3d_prob):
            mw = np.r_[np_se3_mul(np.asarray(p_wc, np.float64),
                                  np.asarray(meas, np.float64)[:7]),
                       np.asarray(meas, np.float64)[7:]]
            obs3d.append((mw, float(pr) * lm_cfg.scale_3d))
        frames2d = list(rec.obs2d_frame)
        frames3d = list(rec.obs3d_frame)
        grav = (normal, lm_cfg.gravity_scale) if normal is not None else None
        objs.append((np.asarray(rec.vec10, np.float64), obs2d, obs3d,
                     frames2d, frames3d, grav))

    if not objs:
        return 0.0, 0.0

    def run_at(frac):
        t0 = time.perf_counter()
        for vec10, obs2d, obs3d, f2, f3, grav in objs:
            n2 = max(3, int(round(len(obs2d) * frac)))
            n3 = max(1, int(round(len(obs3d) * frac))) if obs3d else 0
            numpy_backend_frame(vec10, obs2d[:n2], obs3d[:n3], grav, K)
        return (time.perf_counter() - t0) * 1e3

    # sampled graph sizes -> linear model ms(n_edges)
    fracs = [0.25, 0.5, 1.0]
    times = [run_at(f) for f in fracs]
    tot2 = sum(len(o[1]) for o in objs)
    tot3 = sum(len(o[2]) for o in objs)
    edges = [max(1, int(round((tot2 + tot3) * f))) for f in fracs]
    A = np.vstack([edges, np.ones(len(edges))]).T
    coef, _, _, _ = np.linalg.lstsq(A, np.array(times), rcond=None)

    # per-frame edge counts as the graph grows (the reference re-runs the
    # FULL graph each frame once any object is initialized)
    first_init = min(min(o[3][0] if o[3] else 1 << 30,
                         o[4][0] if o[4] else 1 << 30) for o in objs)
    per_frame = []
    for f in range(n_frames):
        ne = sum(sum(1 for x in o[3] if x <= f)
                 + sum(1 for x in o[4] if x <= f) for o in objs)
        if ne == 0 or f < first_init:
            per_frame.append(0.0)
        else:
            per_frame.append(float(coef[0] * ne + coef[1]))
    return float(np.mean(per_frame)), times[-1]


def main():
    import jax
    import jax.numpy as jnp
    from object_oriented_slam_tpu.backend import optimize_objects_soa
    from object_oriented_slam_tpu.io import TUMDataset

    ds = TUMDataset(CABINET)
    frames = list(ds.frames())
    n_frames = len(frames)

    # ---- pass 1: warm (compiles, tier growth, remote-service ramp).
    # Every jit wrapper the tracker uses is process-shared (tracking.py
    # _SHARED_JIT + module-level extractor jits), so each observation
    # tier this pass touches stays compiled for the timed passes — the
    # BENCH_r04 mid-pass 469 ms backend stall was a fresh System
    # re-compiling a tier program inside the timed pass. -----------------
    warm, _, _, _ = run_pipeline(frames)
    # ---- passes 2+3: timed, best-of-two (the tunnel's minute-scale
    # latency swings would otherwise dominate the mean).  All tail
    # statistics come from the single best pass so mean/p50/p90 are
    # mutually consistent. ---------------------------------------------
    best = None
    for _ in range(2):
        slam_i, per_frame_i, drain_i, per_call_i = run_pipeline(frames)
        mean_i = (sum(per_frame_i) + drain_i) / n_frames * 1e3
        if best is None or mean_i < best[0]:
            best = (mean_i, slam_i, per_frame_i, drain_i, per_call_i)
    e2e_mean, slam, per_frame, drain, per_call = best
    pf_ms = np.asarray(per_frame) * 1e3
    e2e_p50 = float(np.median(pf_ms))

    def _stage_tail(samples, prefix):
        """p50/p90/max of a per-frame stage distribution (ms)."""
        if not samples:
            return {}
        a = np.asarray(samples) * 1e3
        return {prefix + "p50_ms": round(float(np.percentile(a, 50)), 3),
                prefix + "p90_ms": round(float(np.percentile(a, 90)), 3),
                prefix + "max_ms": round(float(a.max()), 3)}

    m = slam.tracker.metrics
    tail = {
        "e2e_p90_ms": round(float(np.percentile(pf_ms, 90)), 3),
        "e2e_p99_ms": round(float(np.percentile(pf_ms, 99)), 3),
        "e2e_max_ms": round(float(pf_ms.max()), 3),
        # the one-shot ground-plane frame (first frame with depth) is a
        # per-run fixed cost the reference pays too; mean excluding it
        # separates that from the recurring tail
        "e2e_frame0_ms": round(float(pf_ms[0]), 3),
        "e2e_mean_excl_frame0_ms": round(float(pf_ms[1:].mean()), 3),
        "drain_ms": round(drain * 1e3, 3),
    }
    tail.update(attribute_tail(pf_ms, per_call))
    # regression pin: tests/test_bench_guard.py fails if a recorded
    # driver bench's p90 exceeds 2x this pin (VERDICT r4 #2)
    tail["e2e_p90_pin_ms"] = E2E_P90_PIN_MS
    tail.update(_stage_tail(m["dispatch"], "dispatch_"))
    tail.update(_stage_tail(m["fetch"], "fetch_"))
    tail.update(_stage_tail(m["host"], "host_"))
    tail.update(_stage_tail(m["backend"], "backend_"))
    # fetches that blocked on the tunnel (async copy had not landed)
    tail["blocked_fetches"] = int(sum(1 for f in m["fetch"] if f > 3e-3))
    tail["fetch_total_ms"] = round(sum(m["fetch"]) * 1e3, 2)

    K32 = jnp.asarray(slam.tracker.K.astype(np.float32))
    Knp = slam.tracker.K.astype(np.float64)

    # ---- production-shape backend call (2D + 3D + gravity, tiered) ----
    obs = slam.tracker._build_backend_batch()
    gp = slam.tracker.state.ground_plane
    gset = gp is not None
    normal32 = jnp.asarray((gp[:3] if gset else np.zeros(3))
                           .astype(np.float32))
    cfg = slam.tracker.lm_cfg
    opt = jax.jit(optimize_objects_soa, static_argnames=("cfg",))

    # warmup past the remote service's slow first executions (~30)
    est, chi2 = opt(obs, K32, normal32, gset, cfg)
    float(chi2.sum())
    warm_c = [opt(obs, K32, normal32, gset, cfg)[1] for _ in range(30)]
    float(sum(c.sum() for c in warm_c))

    n_rep = 30
    lm_ms = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        chis = [opt(obs, K32, normal32, gset, cfg)[1] for _ in range(n_rep)]
        float(sum(c.sum() for c in chis))
        lm_ms = min(lm_ms, (time.perf_counter() - t0) / n_rep * 1e3)

    # ---- f64 baselines ------------------------------------------------
    _, cam, ext_cfg = make_system()
    base_fe_ms, fe_samples = baseline_frontend_ms(
        frames, slam.tracker.state.ground_plane, cam, ext_cfg)
    base_be_mean_ms, base_be_final_ms = baseline_backend_model(
        slam, Knp, n_frames)
    base_e2e_ms = base_fe_ms + base_be_mean_ms

    out = {
        "metric": "e2e_ms_per_frame",
        "value": round(e2e_mean, 3),
        "unit": "ms",
        "vs_baseline": round(base_e2e_ms / e2e_mean, 1),
        "baseline_kind": "f64 single-thread numpy replica of the "
                         "reference pipeline (not the C++ binary)",
        "e2e_p50_ms": round(e2e_p50, 3),
        "frames": n_frames,
        "baseline_e2e_ms_per_frame": round(base_e2e_ms, 1),
        "baseline_frontend_ms": round(base_fe_ms, 1),
        "baseline_backend_ms_per_frame": round(base_be_mean_ms, 1),
        "backend_ba_ms_per_frame": round(lm_ms, 3),
        "vs_baseline_backend": round(base_be_final_ms / lm_ms, 1),
        # adaptive-depth controller activity in the best timed pass
        # (4 = held base; >4 = blocked fetches triggered deepening;
        # null = no frames ran, not "depth 0")
        "pipeline_depth_max": (max(slam.tracker.depth_trace)
                               if slam.tracker.depth_trace else None),
    }
    out.update(tail)

    # ---- rooflines for both device programs ---------------------------
    out.update(roofline(
        opt.lower(obs, K32, normal32, gset, cfg).compile(), lm_ms, "lm_"))
    try:
        from object_oriented_slam_tpu.frontend.extractor import (
            _extract_packed, _pack_frame)
        i, ts, pose, depth, rgb, det = frames[25]
        det = np.asarray(det, np.float64).reshape(-1, 8)
        h = _pack_frame(cam, ext_cfg, depth, det[:, 1:5], det[:, 5]
                        .astype(int), pose.astype(np.float32),
                        slam.tracker.state.ground_plane)
        lowered = _extract_packed.lower(
            h.depth_j, jnp.asarray(h.flat), cam, h.cfg, h.pad, h.need_s,
            h.need_d).compile()
        # extraction device time ~= the pipeline's deferred-fetch wait +
        # dispatch (the loop is extraction-bound; see BENCH_DETAILS);
        # time it directly: dispatch n reps, sync once
        ext_call = lambda: _extract_packed(
            h.depth_j, jnp.asarray(h.flat), cam, h.cfg, h.pad, h.need_s,
            h.need_d)
        outs = [ext_call() for _ in range(10)]
        float(np.asarray(outs[-1]).sum())
        t0 = time.perf_counter()
        outs = [ext_call() for _ in range(20)]
        float(np.asarray(outs[-1]).sum())
        ext_ms = (time.perf_counter() - t0) / 20 * 1e3
        out["ext_ms_per_frame"] = round(ext_ms, 3)
        out.update(roofline(lowered, ext_ms, "ext_"))
    except Exception:
        pass

    # ---- offline (throughput/batch) mapping mode ----------------------
    # One batched extraction program + one global-BA program per B
    # frames instead of 2 programs/frame (system/offline.py).  On the
    # tunneled device this trades per-program fixed overhead (5-30 ms)
    # for device-compute-bound batches; wall-clock lands near the online
    # pipeline (which hides its overheads by deferral) while the
    # batched program's utilization is the honest per-chip number.
    try:
        from object_oriented_slam_tpu.frontend.batch_extractor import (
            _extract_multi_packed, pack_frames_batch)
        from object_oriented_slam_tpu.system.offline import OfflineMapper

        def run_offline(**kw):
            slam_o, cam_o, cfg_o = make_system()
            mapper = OfflineMapper(slam_o, cam_o, cfg_o, batch_size=8,
                                   **kw)
            return mapper.run(iter(frames))

        run_offline()                      # warm (compiles)
        off = min((run_offline() for _ in range(2)),
                  key=lambda s: s["seconds"])
        # split protocol with the u16 fixed-point phase-A transfer
        # (~2.6x smaller bulk download; VERDICT r4 #4)
        try:
            run_offline(split=True)        # warm
            off_q = min((run_offline(split=True) for _ in range(2)),
                        key=lambda s: s["seconds"])
            out["offline_split_quant_fps"] = round(off_q["fps"], 2)
            out["offline_split_quant_ms_per_frame"] = round(
                off_q["seconds"] / off_q["frames"] * 1e3, 3)
        except Exception as e:
            out["offline_split_error"] = repr(e)[:120]
        out["offline_fps"] = round(off["fps"], 2)
        out["offline_ms_per_frame"] = round(
            off["seconds"] / off["frames"] * 1e3, 3)
        out["offline_vs_online"] = round(
            out["offline_ms_per_frame"] and
            e2e_mean / out["offline_ms_per_frame"], 2)
        best_off = min(out["offline_ms_per_frame"],
                       out.get("offline_split_quant_ms_per_frame",
                               float("inf")))
        out["offline_best_vs_online"] = round(e2e_mean / best_off, 2)

        # roofline of the batched extraction program (B=8 cabinet
        # frames, the shapes the mapper dispatches)
        tr = slam.tracker
        recs = []
        for (fi, ts, pose, depth, rgb, det) in frames[1:9]:
            det = np.asarray(det, np.float64).reshape(-1, 8)
            recs.append((depth, det[:, 1:5], det[:, 5].astype(int),
                         tr.run_gates(det, True), pose))
        fb = pack_frames_batch(cam, ext_cfg, recs,
                               tr.state.ground_plane, min_pad=8)
        g = fb.B
        while fb.pad % g != 0:
            g //= 2
        bargs = (jnp.asarray(fb.depths), jnp.asarray(fb.flat), cam,
                 fb.cfg, fb.pad, fb.B, fb.need_s, fb.need_d)
        bkw = {"cluster_groups": g}
        lowered_b = _extract_multi_packed.lower(*bargs, **bkw).compile()
        float(jnp.sum(_extract_multi_packed(*bargs, **bkw)))
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            float(jnp.sum(_extract_multi_packed(*bargs, **bkw)))
        batch_ms = (time.perf_counter() - t0) / reps * 1e3
        out["ext_batch_ms"] = round(batch_ms, 2)
        out["ext_batch_frames"] = fb.B
        out.update(roofline(lowered_b, batch_ms, "ext_batch_"))
    except Exception as e:
        out["offline_error"] = repr(e)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
