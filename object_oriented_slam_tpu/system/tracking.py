"""Per-frame pipeline orchestrator.

TPU-native re-design of ``/root/reference/src/core/Tracking.cpp``: the host
drives the frame loop and appends observations into fixed-capacity buffers;
all heavy per-frame work (single-frame ellipsoid extraction, the global
object-graph LM) runs as jit-compiled batched device functions with static
shapes, so every frame after the first reuses the same executables.

Per-frame flow (GrabPoseAndObjects, Tracking.cpp:170-204):
  1. record frame
  2. UpdateObjectObservation (:493-564): ground-plane estimation (once),
     per-bbox 3D ellipsoid extraction, data association (manual column 7 or
     automatic), key-observation gating, store 2D/3D observations
  3. JudgeInitialization (:566-638): SVD init after enough 2D observations,
     or direct seeding from the latest single-frame 3D estimate
  4. ProcessCurrentFrame (:219-257): global object-graph optimization over
     all observations (every frame, like the reference)
"""
from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..assoc import (InstanceCounter, associate_observations,
                     associate_observations_optimal)
from ..backend import LMConfig, ObjectObservations, optimize_objects
from ..core import camera as cam_mod
from ..init import init_quadric_svd
from ..io.config import Config
from ..utils import calibrate_measurement_np
from .state import SlamState

import jax


def _np_se3_inv(p):
    import numpy as _np
    q = p[3:] * _np.array([-1.0, -1, -1, 1])
    x, y, z, w = q
    t = p[:3]
    # rotate -t by q
    qv = q[:3]
    tt = 2.0 * _np.cross(qv, -t)
    rt = -t + w * tt + _np.cross(qv, tt)
    return _np.concatenate([rt, q])


def _np_se3_mul(a, b):
    qa, qb = a[3:], b[3:]
    x1, y1, z1, w1 = qa
    x2, y2, z2, w2 = qb
    q = np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])
    qv, w = qa[:3], qa[3]
    t2 = 2.0 * np.cross(qv, b[:3])
    tb = b[:3] + w * t2 + np.cross(qv, t2)
    return np.concatenate([a[:3] + tb, q / np.linalg.norm(q)])


# sentinel: this frame's extraction ran under the fused protocol; the
# result is (or will be) in Tracking._ext_results[frame_id]
_FUSED_PENDING = object()

# Process-wide jit wrappers shared by every Tracking instance.  A
# per-instance ``jax.jit`` owns a private trace/executable cache, so a
# fresh ``System`` re-traced and re-compiled every observation-tier
# program it touched — benign for a single long-lived system, but a
# multi-pass benchmark (or any multi-system process) paid a mid-run
# ~0.3-0.5 s persistent-cache reload the first time each tier appeared
# in a timed pass (the unattributed BENCH_r04 p99).  The wrapped
# functions are pure; sharing is semantics-free.
_SHARED_JIT: Dict = {}


def _shared_opt_fn(use_soa: bool):
    key = ("opt", use_soa)
    if key not in _SHARED_JIT:
        from ..backend import optimize_objects_soa
        _SHARED_JIT[key] = jax.jit(
            optimize_objects_soa if use_soa else optimize_objects,
            static_argnames=("cfg",))
    return _SHARED_JIT[key]


def _shared_init_fn(rows: int, cols: int):
    """Packed [11] SVD-init program (vec10, ok), keyed by image size."""
    key = ("init", rows, cols)
    if key not in _SHARED_JIT:
        def _init_packed(p, b, m, K):
            res = init_quadric_svd(p, b, m, K, rows, cols)
            return jnp.concatenate(
                [res.ellipsoid,
                 res.ok.astype(res.ellipsoid.dtype)[None]])
        _SHARED_JIT[key] = jax.jit(_init_packed)
    return _SHARED_JIT[key]


def _default_plane_check(plane_world) -> bool:
    """Tracking.cpp:758-772: print the plane, ask Y/N on the terminal.
    Non-interactive runs auto-accept (the reference would block forever
    on getchar)."""
    import sys
    print(f"Estimated ground plane: {np.round(plane_world, 4)}")
    if not sys.stdin.isatty():
        return True
    ans = input("Accept ground plane? [Y/n] ").strip().lower()
    return ans in ("", "y", "yes")


class Tracking:
    """Host orchestrator with jitted device kernels.

    ``extractor``: optional callable implementing single-frame ellipsoid
    estimation.  Signature: ``extractor(depth_u16, bboxes[N,4], labels[N],
    pose_wc7, ground_plane_vec4) -> (vec10_local[N,10], prob[N], valid[N])``.
    """

    # capacities of the batched backend call.  MAX_OBJECTS is the
    # INITIAL object tier: the object axis grows 24 -> 48 -> 96 -> ...
    # on demand (one recompile per growth, _grow_object_tier), because
    # the reference has no instance cap at all (Optimizer.cpp:175-180
    # makes a vertex per initialized instance; Map.cpp:31-42 grows
    # unboundedly).  The observation axes are hard-capped ring windows.
    MAX_OBJECTS = 24
    MAX_OBS2D = 512
    MAX_OBS3D = 256

    def __init__(self, config: Config,
                 extractor: Optional[Callable] = None,
                 plane_estimator: Optional[Callable] = None):
        self.cfg = config
        self.camera = cam_mod.Camera(
            fx=config.get_float("Camera.fx"),
            fy=config.get_float("Camera.fy"),
            cx=config.get_float("Camera.cx"),
            cy=config.get_float("Camera.cy"),
            scale=config.get_float("Camera.scale"),
            width=config.get_int("Camera.width", 640),
            height=config.get_int("Camera.height", 480),
        )
        self.K = self.camera.K
        self.rows = self.camera.height
        self.cols = self.camera.width
        self.state = SlamState()
        self.extractor = extractor
        self.plane_estimator = plane_estimator
        self.da_counter = InstanceCounter()
        self.open_optimization = True
        self.depth_ellipsoid_opened = extractor is not None

        self.lm_cfg = LMConfig(
            scale_3d=config.get_float("Optimizer.Edges.3DEllipsoid.Scale", 1.0),
            gravity_scale=config.get_float("Optimizer.Edges.GravityPrior.Scale", 1.0),
            gravity_on=config.get_int("Optimizer.Edges.GravityPrior.Open") == 1,
            # the reference hardcodes check_visibility=false at the call
            # site (Optimizer.cpp:232 'c1'); here it is a config key,
            # still off by default
            check_visibility=config.get_int(
                "Optimizer.Edges.2DProjection.CheckVisibility") == 1,
            vis_rows=self.rows, vis_cols=self.cols,
        )
        self.border_px = config.get_int("Measurement.Border.Pixels")
        self.length_limit_px = config.get_int("Measurement.LengthLimit.Pixels")
        self.min_init_frames = int(config.read_value(
            "Tracking_MINIMUM_INITIALIZATION_FRAME"))
        self.keyframe_check_close = config.get_int(
            "Tracking.KeyFrameCheck.Close") == 1
        # opt-in globally-optimal gated assignment (assoc/association.py);
        # default is the reference's greedy row-wise matching
        self.use_optimal_assoc = config.get_int(
            "Tracking.DataAssociation.Optimal") == 1
        # per-optimizer-run object_list.txt dump (Optimizer.cpp:308-316
        # writes ./object_list.txt unconditionally; here behind a key so
        # the default run does not litter the cwd)
        self.write_object_list = config.get_int(
            "Optimizer.WriteObjectList.Open") == 1
        self.object_list_path = "./object_list.txt"
        # dense visualization map driven by the config key exactly like
        # Tracking.cpp:234-250 (absent key -> 0 -> off)
        self.dense_builder = None
        if config.get_int("Visualization.Builder.Open") == 1:
            from .dense_builder import DenseBuilder
            self.dense_builder = DenseBuilder(self.camera)
        # interactive ground-plane confirmation (Tracking.cpp:758-772):
        # when open, the estimated plane is offered to
        # ``plane_manual_check_fn`` (default: terminal Y/N when stdin is
        # a tty, auto-accept otherwise); rejection keeps the estimation
        # state machine at 1 so the next frame retries
        self.plane_manual_check = config.get_int(
            "Plane.MannualCheck.Open") == 1
        self.plane_manual_check_fn = _default_plane_check

        # SoA backend: same factor-graph semantics, observation axis in
        # lanes (backend/lm_soa.py) — several times faster per call on TPU
        # than the AoS layout; agreement to f32 round-off (~1e-4 on the
        # map, far inside the goldens' 0.05 m tolerance)
        self.use_soa_backend = True
        self._opt_fn = _shared_opt_fn(self.use_soa_backend)
        self._mesh = None  # set by enable_distributed
        # host-side incremental SVD init: O(1) Gram update per observation,
        # one 10x10 eigh per attempt, no device round trip (the jitted
        # batch initializer stays available behind the flag)
        from ..init.svd_incremental import IncrementalQuadricInit
        self.use_incremental_init = True
        self._inc_init = IncrementalQuadricInit(self.K, self.rows, self.cols)
        # Cross-frame pipelining.  Two independent mechanisms, both
        # preserving the reference's strict per-frame processing order
        # (obs -> init -> backend per frame, Tracking.cpp:170-204) and
        # bit-identical results; only the wall-clock moment the host
        # *reads* device results shifts:
        #   1. extraction deferral: frame t's extraction is dispatched
        #      immediately, its async host copy starts right away, and the
        #      host-side processing runs pipeline_depth-1 frames later --
        #      by then compute AND transfer have finished, so the fetch
        #      costs ~0 instead of compute + a tunnel round trip
        #      (~25-100 ms on the remote axon link, varies by day);
        #   2. backend chaining: each LM call warm-starts from the
        #      previous call's on-device output, so its host drain (for
        #      history/outputs only) can lag arbitrarily -- results are
        #      drained in dispatch order once their async copies have had
        #      pipeline_depth frames to land.
        # sync() flushes both queues.  pipeline_depth=1 => eager.
        from collections import deque
        self.pipelined = True
        # NOTE: ``pipeline_depth`` is a property — assigning it re-bases
        # the adaptive controller (``_depth_base``) so a caller-pinned
        # depth is never silently drifted back toward the old base; the
        # controller itself adjusts ``_pipeline_depth`` directly.
        self.pipeline_depth = 4
        # Adaptive pipeline depth.  The tunneled device's blocking fetch
        # cost swings by the hour (7-45 ms measured, BENCH_DETAILS); when
        # the due frame's extraction copy has NOT landed by processing
        # time, the fetch blocks for the residual compute+transfer.
        # Deepening the window gives later copies more frame periods to
        # land.  Controller: if the last 3 extraction fetches all blocked
        # (> adapt_deepen_s), deepen by one (cap adapt_depth_max); if the
        # last 16 were all free (< adapt_shallow_s) and we are above the
        # configured base, shallow by one (lower result latency for live
        # viz / checkpointing).  Pure scheduling — per-frame processing
        # order and inputs are unchanged, so results are identical at any
        # depth (tests/test_pipeline_equivalence.py, test_adaptive_depth.py).
        self.adaptive_depth = True
        self.adapt_depth_max = 8
        self.adapt_deepen_s = 3e-3
        self.adapt_shallow_s = 1e-3
        self._adapt_fetches = deque(maxlen=16)
        self._saturation_logged = False  # one-shot wrong-architecture hint
        self._flushing = False  # sync() drain: fetches there say nothing
        #                         about steady-state latency, skip adaptation
        # LM fusion: ride the due frame's global-BA LM on the next
        # extraction program (one device program per frame total).  The
        # right design for real TPU hardware (dispatch is ~us there), but
        # measured SLOWER on the tunneled axon device (p50 16-17 -> 18-24
        # ms, A/B 2026-08-21): the loop's critical path is the wait for
        # the due frame's extraction result, and bundling the LM into
        # that program lengthens the wait while dispatches are already
        # overlapped.  Default off here; flip on for local TPUs.
        self.fuse_lm = False
        self._deferred_lm = None
        self._ext_results: Dict[int, object] = {}  # fused-protocol results
        # async one-shot ground-plane estimation: the dispatching frame's
        # body is deferred until the next grab resolves the plane fetch
        # (see _resolve_pending_plane); pure scheduling, results identical
        self.async_plane = True
        self._pending_plane = None
        self._plane_deferred: List[tuple] = []
        self._pending_extraction = deque()
        self._pending_backends = deque()   # (frame_no, est, slots, nobs)
        self._backend_calls = 0
        self.max_objects = self.MAX_OBJECTS  # current object-axis tier
        self._init_np_buffers()
        # packed [11] output (vec10, ok) -> one host fetch per attempt
        self._init_fn = _shared_init_fn(self.rows, self.cols)
        # per-frame instrumentation (seconds), see SURVEY.md section 5
        self.metrics: Dict[str, List[float]] = {"backend": [], "frontend": [],
                                                "total": [], "dispatch": [],
                                                "fetch": [], "host": [],
                                                "plane_wait": []}
        self.depth_trace: List[int] = []  # pipeline_depth per frame

    # ------------------------------------------------------------------
    @property
    def pipeline_depth(self) -> int:
        return self._pipeline_depth

    @pipeline_depth.setter
    def pipeline_depth(self, value: int):
        """Pin/re-base the deferral window.  Also resets the adaptive
        controller's base so it never drifts a caller-set depth back
        toward an older value (the controller mutates ``_pipeline_depth``
        directly and leaves the base alone)."""
        self._pipeline_depth = int(value)
        self._depth_base = int(value)
        if hasattr(self, "_adapt_fetches"):
            self._adapt_fetches.clear()

    # ------------------------------------------------------------------
    def open_ground_plane_estimation(self):
        """Tracking.cpp:690-703."""
        self.state.ground_state = 1

    # ------------------------------------------------------------------
    def grab_pose_and_objects(self, timestamp: float, pose_wc: np.ndarray,
                              det_mat: np.ndarray, depth: Optional[np.ndarray],
                              rgb: Optional[np.ndarray] = None,
                              with_association: bool = True,
                              ext_result=None) -> bool:
        """One frame of the pipeline (System::TrackWithObjects entry).

        ``ext_result``: precomputed extraction output ([pad, 12] host or
        device array, rows aligned with detections) — supplied by the
        offline/batch mapping driver (system/offline.py) whose frame
        batches run extraction as one device program; the per-frame
        extractor dispatch is skipped, everything downstream (gates,
        association, init, backend) is identical.
        """
        import time
        # a plane estimate dispatched async by an earlier frame: resolve
        # it now (its copy had a full frame period to land -> ~0-cost
        # fetch) and replay that frame's deferred body first, in order.
        # BEFORE this frame's t0: the wait and the replayed bodies carry
        # their own metric entries (plane_wait + the replayed frames'
        # dispatch), so this frame's stages stay cleanly attributed.
        self._resolve_pending_plane()
        t0 = time.perf_counter()
        pose_wc = np.asarray(pose_wc, np.float64)
        frame_id = len(self.state.frames_pose_wc)
        self.state.frames_pose_wc.append(pose_wc)
        self.state.frames_ts.append(timestamp)
        det_mat = np.asarray(det_mat, np.float64).reshape(-1, 8) \
            if det_mat is not None and det_mat.size else np.zeros((0, 8))

        # ---- [1.1] ground plane estimation (once) ---------------------
        if self.state.ground_state == 1 and self.plane_estimator is not None \
                and depth is not None:
            if (self.async_plane
                    and hasattr(self.plane_estimator, "dispatch")
                    and self.pipelined and self.pipeline_depth >= 2):
                # async one-shot: dispatch the plane program + host copies
                # and DEFER this frame's whole body until the result is
                # resolved at the next grab (or sync()) — the blocking
                # round trip the reference pays synchronously
                # (Tracking.cpp:716-799) overlaps the next frame's arrival
                self._pending_plane = (
                    self.plane_estimator.dispatch(depth), pose_wc)
                self._plane_deferred.append(
                    (frame_id, pose_wc, det_mat, depth, rgb,
                     with_association, ext_result))
                return True
            plane_cam = self.plane_estimator(depth)
            if plane_cam is not None:
                self._latch_plane(plane_cam, pose_wc)
                # else: state stays 1, retry next frame
                # (Tracking.cpp:766-771)
        return self._frame_body(frame_id, pose_wc, det_mat, depth, rgb,
                                with_association, ext_result, t0)

    # ------------------------------------------------------------------
    def _latch_plane(self, plane_cam, pose_wc):
        """World-transform + manual check + latch (Tracking.cpp:723-771)."""
        pw = np.asarray(plane_cam, np.float64)
        # to world (Tracking.cpp:723-724)
        from ..core import plane as plane_mod
        pw = np.asarray(plane_mod.transform(
            jnp.asarray(pw.astype(np.float32)),
            jnp.asarray(pose_wc.astype(np.float32))), np.float64)
        if (not self.plane_manual_check
                or self.plane_manual_check_fn(pw)):
            self.state.ground_plane = pw
            self.state.ground_state = 2

    # ------------------------------------------------------------------
    def _resolve_pending_plane(self):
        """Fetch an async plane dispatch and replay deferred frames.

        Replay order preserves the reference's strict per-frame
        processing: the deferred frames' bodies (extraction dispatch,
        association, init, backend) run before the current frame's.
        On a failed estimate the deferred frames replay WITHOUT a
        latched plane (ground_state stays 1), which skips extraction
        exactly like the reference's state machine does for frames seen
        while estimation is still open."""
        if self._pending_plane is None:
            return
        import time
        handle, disp_pose = self._pending_plane
        self._pending_plane = None
        t0 = time.perf_counter()
        plane_cam = self.plane_estimator.resolve(handle)
        if plane_cam is not None:
            self._latch_plane(plane_cam, disp_pose)
        # how long the resolve blocked (compute not finished when the
        # next frame arrived): back-to-back feeds pay most of the plane
        # compute here; real-time feeds pay ~0 (bench attributes it)
        self.metrics["plane_wait"].append(time.perf_counter() - t0)
        deferred, self._plane_deferred = self._plane_deferred, []
        for (fid, pw, dm, dep, rg, wa, er) in deferred:
            self._frame_body(fid, pw, dm, dep, rg, wa, er,
                             time.perf_counter())

    # ------------------------------------------------------------------
    def _frame_body(self, frame_id, pose_wc, det_mat, depth, rgb,
                    with_association, ext_result, t0):
        """Everything after ground-plane handling for one frame:
        extraction dispatch, pipeline bookkeeping, deferred processing."""
        import time
        # ---- [1.2] single-frame ellipsoid estimation (dispatch) --------
        n_det = det_mat.shape[0]
        ext_out = None
        run = np.zeros(n_det, bool)
        if (self.depth_ellipsoid_opened or ext_result is not None) \
                and depth is not None and n_det > 0 \
                and self.state.ground_state == 2:
            bboxes = det_mat[:, 1:5].copy()
            labels = det_mat[:, 5].astype(int)
            run[:] = self.run_gates(det_mat, with_association)
            if ext_result is not None:
                # offline/batch mode: result precomputed by the frame-
                # batched program; no per-frame dispatch
                ext_out = ext_result if np.any(run) else None
            elif np.any(run):
                # LM fusion: process the due pipeline frame FIRST so its
                # packed LM batch rides this frame's extraction program —
                # one device program per frame instead of two.
                # NOTE: popping before this frame's dispatch means the due
                # frame is consumed one dispatch earlier than the normal
                # pipeline pop below, shrinking the window for its
                # extraction result's async copy to land by one frame
                # period — part of why fuse_lm measures slower on the
                # tunneled device (BENCH_DETAILS round-2 A/B) and
                # defaults off there; on local TPUs the fetch is cheap
                # and the one-program-per-frame win dominates.
                self._deferred_lm = None
                if (self.fuse_lm and self.pipeline_depth >= 2
                        and self._mesh is None
                        and getattr(self.extractor, "supports_lm_fusion",
                                    False)
                        and len(self._pending_extraction)
                        >= self.pipeline_depth - 1):
                    self._process_frame_obs(
                        *self._pending_extraction.popleft(),
                        defer_backend=True)
                if getattr(self.extractor, "fused", False):
                    # fused split protocol: one device program per frame;
                    # the result delivered now belongs to an EARLIER frame
                    if self._deferred_lm is not None and hasattr(
                            self.extractor, "step_with_lm"):
                        # fused-split + LM fusion: the due backend batch
                        # rides the same program as phases A+B
                        prep = self._deferred_lm
                        self._deferred_lm = None
                        lm_args = (jnp.asarray(prep["flat"]),
                                   prep["est_prev"],
                                   jnp.asarray(self.K.astype(np.float32)),
                                   jnp.asarray(prep["normal"]),
                                   prep["gset"],
                                   self._lm_layout(prep["O"],
                                                   prep["M2t"],
                                                   prep["M3t"]),
                                   self.lm_cfg)
                        ran, results, est, _chi2 = \
                            self.extractor.step_with_lm(
                                frame_id, depth, bboxes, labels, pose_wc,
                                self.state.ground_plane, lm_args)
                        if est is not None:
                            self._finish_backend(prep, est)
                        else:
                            self._dispatch_prepared(prep)
                    else:
                        ran, results = self.extractor.step(
                            frame_id, depth, bboxes, labels, pose_wc,
                            self.state.ground_plane)
                    for fid, b in results:
                        if hasattr(b, "copy_to_host_async"):
                            try:
                                b.copy_to_host_async()
                            except Exception:
                                pass
                        self._ext_results[fid] = b
                    ext_out = _FUSED_PENDING if ran else None
                elif self._deferred_lm is not None:
                    prep = self._deferred_lm
                    self._deferred_lm = None
                    lm_args = (jnp.asarray(prep["flat"]), prep["est_prev"],
                               jnp.asarray(self.K.astype(np.float32)),
                               jnp.asarray(prep["normal"]), prep["gset"],
                               self._lm_layout(prep["O"],
                                               prep["M2t"], prep["M3t"]),
                               self.lm_cfg)
                    res = self.extractor.dispatch_with_lm(
                        depth, bboxes, labels, pose_wc,
                        self.state.ground_plane, lm_args)
                    if res is None:
                        self._dispatch_prepared(prep)
                    else:
                        ext_out, est, _chi2 = res
                        self._finish_backend(prep, est)
                else:
                    ext_out = self.extractor(depth, bboxes, labels,
                                             pose_wc,
                                             self.state.ground_plane)
                if self._deferred_lm is not None:
                    # processed frame prepared an LM but this frame's
                    # dispatch couldn't carry it (e.g. fused-split
                    # extractor): run it standalone
                    prep, self._deferred_lm = self._deferred_lm, None
                    self._dispatch_prepared(prep)

        # fused-protocol housekeeping on frames that dispatched no
        # extraction: consume pending phase-A handles that are already
        # chain_lag frames old, so detection-sparse stretches don't leave
        # them for the flush() fallback (which would also run the
        # youngest handle's phase B against a just-dispatched async copy
        # — a blocking fresh-fetch round trip on the tunnel)
        if ext_out is None and getattr(self.extractor, "fused", False):
            for fid, b in self.extractor.drain(frame_id):
                if hasattr(b, "copy_to_host_async"):
                    try:
                        b.copy_to_host_async()
                    except Exception:
                        pass
                self._ext_results[fid] = b

        # dense visualization map (Tracking.cpp:234-250, config-gated)
        if self.dense_builder is not None and depth is not None:
            self.dense_builder.process_frame(rgb, depth, pose_wc)

        item = [frame_id, pose_wc, det_mat, ext_out, run, with_association]
        # start the extraction result's host copy now: it has
        # pipeline_depth-1 frame periods to land before it is read
        # (two-phase handles start their own phase-A copy at dispatch)
        if ext_out is not None and hasattr(ext_out, "copy_to_host_async"):
            try:
                ext_out.copy_to_host_async()
            except Exception:
                pass
        self.metrics["dispatch"].append(time.perf_counter() - t0)
        if self.pipeline_depth >= 2 and self.extractor is not None:
            self._pending_extraction.append(item)
            self._midway_due()
            # `while`, not `if`: adaptive shallowing drains the surplus.
            # Re-run _midway_due after every pop — a two-item drain shifts
            # queue indices by 2 while the midway index moves by 1, which
            # would otherwise skip one phase-A handle's midway slot and
            # push it into the blocking midway fallback at processing time.
            while len(self._pending_extraction) >= self.pipeline_depth:
                self._process_frame_obs(*self._pending_extraction.popleft())
                self._midway_due()
            # backend time is recorded inside the deferred processing
            t1 = t2 = t3 = time.perf_counter()
        else:
            self._process_frame_obs(*item)
            t1, t2, t3 = self._t1, self._t2, self._t3
            self.metrics["backend"].append(t3 - t2)
        self.metrics["frontend"].append(t1 - t0)
        self.metrics["total"].append(t3 - t0)
        self.depth_trace.append(self.pipeline_depth)
        return True

    # ------------------------------------------------------------------
    def run_gates(self, det_mat, with_association: bool) -> np.ndarray:
        """Extraction gates c1 (bbox on border) and c3 (invalid manual
        association), Tracking.cpp:313-327.  Shared with the offline
        batch driver so its packed run lanes match the online path."""
        n_det = det_mat.shape[0]
        run = np.ones(n_det, bool)
        for i in range(n_det):
            _, is_border = calibrate_measurement_np(
                det_mat[i, 1:5].copy(), self.rows, self.cols,
                self.border_px, self.length_limit_px)
            if is_border:
                run[i] = False
            if with_association and det_mat[i, 7] < 0:
                run[i] = False
        return run

    # ------------------------------------------------------------------
    def _midway_due(self):
        """Two-phase extractor: run the host clustering + phase-B dispatch
        for the item ``pipeline_depth//2`` frames behind the queue head —
        phase A's async copy has had that long to land, and phase B gets
        the remaining deferral window to compute and stream back."""
        if not getattr(self.extractor, "two_phase", False):
            return
        lag = max(1, self.pipeline_depth // 2)
        k = len(self._pending_extraction) - 1 - lag
        if k >= 0:
            it = self._pending_extraction[k]
            if getattr(it[3], "is_phase_a", False):
                out = self.extractor.midway(it[3])
                if hasattr(out, "copy_to_host_async"):
                    try:
                        out.copy_to_host_async()
                    except Exception:
                        pass
                it[3] = out

    # ------------------------------------------------------------------
    def _process_frame_obs(self, frame_id, pose_wc, det_mat, ext_out, run,
                           with_association, defer_backend=False):
        """Host-side half of a frame: fetch extraction results, associate,
        store observations, initialize, dispatch the backend.

        With ``pipeline_depth>=2`` this runs one frame late (during the
        next frame's device extraction); the processing order and inputs
        per frame are identical to the eager path.

        ``defer_backend``: pack the LM batch into ``self._deferred_lm``
        instead of dispatching — the caller folds it into the next
        extraction program (LM fusion).
        """
        import time
        tp0 = time.perf_counter()
        if ext_out is _FUSED_PENDING:
            ext_out = self._ext_results.pop(frame_id, None)
            if ext_out is None:
                # not delivered by a later step yet: flush the tail
                for fid, b in self.extractor.flush():
                    self._ext_results[fid] = b
                ext_out = self._ext_results.pop(frame_id, None)
        elif ext_out is not None and getattr(ext_out, "is_phase_a", False):
            # un-midway'd two-phase handle (eager mode or sync flush)
            ext_out = self.extractor.midway(ext_out)
        n_det = det_mat.shape[0]
        local_vec10 = np.zeros((n_det, 10))
        local_prob = np.zeros(n_det)
        local_valid = np.zeros(n_det, bool)

        # ---- fetch the extraction results (async copy started at
        # dispatch time, pipeline_depth-1 frames ago; usually landed)
        ext_np = None
        if ext_out is not None and isinstance(ext_out, tuple):
            # legacy extractor protocol: three host arrays
            v10, pr, va = ext_out
            ext_np = np.concatenate(
                [np.asarray(v10, np.float64).reshape(-1, 10),
                 np.asarray(pr, np.float64).reshape(-1, 1),
                 np.asarray(va, np.float64).reshape(-1, 1)], axis=1)
        elif ext_out is not None:
            ext_np = np.asarray(ext_out, np.float64)
        fetch_s = time.perf_counter() - tp0
        self.metrics["fetch"].append(fetch_s)
        if ext_np is not None and self.pipeline_depth >= 2:
            self._adapt_depth(fetch_s)
        if ext_np is not None:
            # the extractor may return fewer rows than detections (its
            # detection-axis capacity); the overflow keeps 2D-only obs
            n_rows = min(n_det, ext_np.shape[0])
            if n_rows < n_det and np.any(run[n_rows:]):
                import logging
                logging.getLogger("object_oriented_slam_tpu").warning(
                    "extractor returned %d rows for %d detections; "
                    "detections beyond the capacity keep 2D-only "
                    "observations", n_rows, n_det)
            r = run[:n_rows]
            local_vec10[:n_rows][r] = ext_np[:n_rows][r, :10]
            local_prob[:n_rows][r] = ext_np[:n_rows][r, 10]
            local_valid[:n_rows][r] = ext_np[:n_rows][r, 11] > 0.5

        # drain backend results whose async copies have had time to land
        # (history/outputs only -- the next LM call warm-starts from the
        # on-device estimate, so nothing downstream blocks on this)
        self._drain_ready_backends()

        # ---- [1.3] data association ----------------------------------
        if with_association:
            associations = [int(round(det_mat[i, 7])) for i in range(n_det)]
        else:
            # automatic: by world-center distance to map objects
            centers = np.zeros((n_det, 3))
            for i in range(n_det):
                if local_valid[i]:
                    world = _np_se3_mul(pose_wc, local_vec10[i, :7])
                    centers[i] = world[:3]
            inst_ids = self.state.initialized_instances()
            map_centers = np.array([self.state.objects[i].vec10[:3]
                                    for i in inst_ids]).reshape(-1, 3)
            assoc_fn = (associate_observations_optimal
                        if self.use_optimal_assoc else associate_observations)
            associations = assoc_fn(
                centers, local_valid, inst_ids, map_centers, self.da_counter)

        # ---- [1.4] key-observation gating (Tracking.cpp:421-475) ------
        kf_checks = self._check_keyframes(associations, pose_wc)

        # ---- [1.5] store observations --------------------------------
        pose_cw = _np_se3_inv(pose_wc)
        for i in range(n_det):
            inst = associations[i]
            if inst < 0 or not kf_checks[i]:
                continue
            # 3D observation
            if local_valid[i]:
                rec = self.state.record(inst)
                rec.obs3d_pose_wc.append(pose_wc)
                rec.obs3d_meas.append(local_vec10[i])
                rec.obs3d_prob.append(float(local_prob[i]))
                rec.obs3d_frame.append(frame_id)
                if rec.label < 0:
                    rec.label = int(det_mat[i, 5])
                self._append_obs3d(inst, pose_wc, local_vec10[i],
                                   float(local_prob[i]))
            # 2D observation
            meas = det_mat[i, 1:5].copy()
            meas_cal, is_border = calibrate_measurement_np(
                meas, self.rows, self.cols, self.border_px,
                self.length_limit_px)
            if is_border:
                continue
            rec = self.state.record(inst)
            rec.obs2d_pose_cw.append(pose_cw)
            rec.obs2d_pose_wc.append(pose_wc)
            rec.obs2d_bbox.append(meas_cal)
            rec.obs2d_prob.append(float(det_mat[i, 6]))
            rec.obs2d_frame.append(frame_id)
            if rec.label < 0:
                rec.label = int(det_mat[i, 5])
            self._append_obs2d(inst, pose_cw, meas_cal,
                               float(det_mat[i, 6]))
            if self.use_incremental_init and not rec.initialized:
                self._inc_init.add_observation(inst, pose_wc, meas_cal)

        self._t1 = time.perf_counter()

        # ---- [2] initialization (Tracking.cpp:566-638) ----------------
        self._judge_initialization()

        # ---- [3] global optimization ----------------------------------
        self._t2 = time.perf_counter()
        if self.open_optimization and self.state.initialized_instances():
            if defer_backend:
                self._deferred_lm = self._prepare_backend()
            else:
                self._run_backend()
        self._t3 = time.perf_counter()
        self.metrics["host"].append(self._t3 - tp0)
        if self.pipeline_depth >= 2 and self.extractor is not None:
            # deferred frame: the grab-side loop recorded only dispatch
            self.metrics["backend"].append(self._t3 - self._t2)

    # ------------------------------------------------------------------
    def _adapt_depth(self, fetch_s: float):
        """Adjust pipeline_depth from the observed blocking-fetch cost of
        extraction results (see the controller comment in __init__)."""
        if not self.adaptive_depth or self._flushing:
            # sync()-time fetches read async copies that never had their
            # full deferral window — they measure the flush, not the
            # steady-state tunnel latency, and must not deepen the window
            return
        w = self._adapt_fetches
        w.append(fetch_s)
        recent = list(w)
        if (len(recent) >= 3 and min(recent[-3:]) > self.adapt_deepen_s
                and self._pipeline_depth >= self.adapt_depth_max
                and not self._saturation_logged):
            # the deepest window still cannot hide the fetch: the
            # dispatch architecture is likely wrong for this link (see
            # system/probe.py on why it is not switched mid-run)
            self._saturation_logged = True
            import logging
            logging.getLogger("object_oriented_slam_tpu").info(
                "extraction fetches still block at the maximum pipeline "
                "depth (%d); the probed dispatch architecture may not "
                "fit this link — consider restarting with --extractor "
                "pinned", self.adapt_depth_max)
        if (len(recent) >= 3 and min(recent[-3:]) > self.adapt_deepen_s
                and self._pipeline_depth < self.adapt_depth_max):
            self._pipeline_depth += 1
            w.clear()
        elif (len(recent) == w.maxlen
                and max(recent) < self.adapt_shallow_s
                and self._pipeline_depth > self._depth_base):
            self._pipeline_depth -= 1
            w.clear()

    # ------------------------------------------------------------------
    def _check_keyframes(self, associations, pose_wc) -> List[bool]:
        if self.keyframe_check_close:
            dis_th, ang_th = 0.0, 0.0
        else:
            dis_th, ang_th = 0.4, math.pi / 180.0 * 15  # Tracking.cpp:433-434
        checks = []
        for inst in associations:
            if inst < 0:
                checks.append(False)
                continue
            rec = self.state.objects.get(inst)
            if rec is None or not rec.obs2d_pose_wc:
                checks.append(True)
                continue
            last = rec.obs2d_pose_wc[-1]
            diff = _np_se3_mul(_np_se3_inv(pose_wc), last)
            dis = float(np.linalg.norm(diff[:3]))
            w = np.clip(abs(diff[6]), -1, 1)
            angle = 2.0 * math.acos(min(1.0, w))
            checks.append(dis > dis_th or angle > ang_th)
        return checks

    # ------------------------------------------------------------------
    def _judge_initialization(self):
        # 2D SVD path
        for inst, rec in self.state.objects.items():
            if rec.initialized or len(rec.obs2d_bbox) < self.min_init_frames:
                continue
            if self.use_incremental_init:
                vec10 = self._inc_init.try_init(inst)
                if vec10 is not None:
                    rec.vec10 = vec10
                    rec.initialized = True
                    self._inc_init.drop(inst)
                continue
            M = len(rec.obs2d_bbox)
            # pad to the next power of two so the jitted initializer compiles
            # only O(log M) distinct shapes over a whole run
            cap = 16
            while cap < M:
                cap *= 2
            poses = np.zeros((cap, 7), np.float32)
            bboxes = np.full((cap, 4), -1.0, np.float32)
            mask = np.zeros(cap, bool)
            poses[:M] = np.stack(rec.obs2d_pose_wc).astype(np.float32)
            bboxes[:M] = np.stack(rec.obs2d_bbox).astype(np.float32)
            mask[:M] = True
            res = np.asarray(self._init_fn(
                jnp.asarray(poses), jnp.asarray(bboxes),
                jnp.asarray(mask), jnp.asarray(self.K)), np.float64)
            if res[10] > 0.5:
                rec.vec10 = res[:10]
                rec.initialized = True

        # 3D path: seed directly from the latest local estimate
        if self.depth_ellipsoid_opened:
            for inst, rec in self.state.objects.items():
                if rec.initialized or not rec.obs3d_meas:
                    continue
                pose_wc = rec.obs3d_pose_wc[-1]
                local = rec.obs3d_meas[-1]
                world_pose = _np_se3_mul(pose_wc, local[:7])
                rec.vec10 = np.concatenate([world_pose, local[7:]])
                rec.initialized = True
                rec.init_by_3d = True
                self._inc_init.drop(inst)

    # ------------------------------------------------------------------
    # Incremental backend buffers: observations are written in place into
    # preallocated [O, M, ...] arrays as they arrive (ring window once a
    # slot's capacity is exceeded -- identical to the "most recent M"
    # window of a rebuilt batch since edge order is irrelevant to the LM).
    def _init_np_buffers(self):
        O, M2, M3 = self.max_objects, self.MAX_OBS2D, self.MAX_OBS3D
        self._slot_of: Dict[int, int] = {}
        self._slot_to_instance = []
        # one contiguous float32 block; the named buffers are views into it
        # so the whole batch ships to the device as a SINGLE transfer (the
        # tunnel pays ~5 ms fixed latency per host->device upload)
        shapes = {
            "est0": (O, 10), "objmask": (O,), "useprev": (O,),
            "p2": (O, M2, 7), "b2": (O, M2, 4), "pr2": (O, M2),
            "m2": (O, M2),
            "p3": (O, M3, 7), "me3": (O, M3, 10), "pr3": (O, M3),
            "m3": (O, M3),
        }
        total = sum(int(np.prod(v)) for v in shapes.values())
        self._b_flat = np.zeros(total, np.float32)
        self._b_views = {}
        self._b_layout = []
        off = 0
        for name, shp in shapes.items():
            n = int(np.prod(shp))
            self._b_views[name] = self._b_flat[off:off + n].reshape(shp)
            self._b_layout.append((name, off, shp))
            off += n
        v = self._b_views
        v["est0"][:] = np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32)
        v["p2"][:] = np.array([0, 0, 0, 0, 0, 0, 1], np.float32)
        v["b2"][:] = -1.0
        v["p3"][:] = np.array([0, 0, 0, 0, 0, 0, 1], np.float32)
        v["me3"][:] = np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32)
        self._b_est0 = v["est0"]
        self._b_objmask = v["objmask"]
        self._b_useprev = v["useprev"]
        self._b_p2, self._b_b2 = v["p2"], v["b2"]
        self._b_pr2, self._b_m2 = v["pr2"], v["m2"]
        self._b_p3, self._b_me3 = v["p3"], v["me3"]
        self._b_pr3, self._b_m3 = v["pr3"], v["m3"]
        self._b_n2 = np.zeros(O, np.int64)
        self._b_n3 = np.zeros(O, np.int64)
        # device-side warm-start chaining: est0 of call k equals the
        # device output of call k-1 for slots already in the previous
        # batch (bit-identical to draining to host and re-uploading, but
        # the host never has to block on the estimate transfer)
        self._est_prev_dev = None
        self._prev_batch_slots: set = set()

        # per-(O,M2,M3)-tier unpack programs live in the process-wide
        # _SHARED_JIT cache (see _get_unpack)

    def _slot_for(self, inst: int):
        slot = self._slot_of.get(inst)
        if slot is None:
            if len(self._slot_of) >= self.max_objects:
                self._grow_object_tier()
            slot = len(self._slot_of)
            self._slot_of[inst] = slot
        return slot

    def _grow_object_tier(self):
        """Double the object-axis capacity (24 -> 48 -> 96 -> ...).

        Same grow-only tier policy as the observation axes' capacity
        tiers: contents copied over, the on-device warm-start estimate
        zero-padded (new slots have useprev=0 so the pad is never read),
        one LM recompile at the new shape.  Replicates the reference's
        unbounded instance count (Optimizer.cpp:175-180, Map.cpp:31-42)
        within the fixed-shape batched design."""
        old_views = {k: v.copy() for k, v in self._b_views.items()}
        old_n2, old_n3 = self._b_n2, self._b_n3
        old_state = (dict(self._slot_of), list(self._slot_to_instance),
                     set(self._prev_batch_slots), self._est_prev_dev)
        O_old = self.max_objects
        self.max_objects = O_old * 2
        import logging
        logging.getLogger("object_oriented_slam_tpu").info(
            "growing backend object tier %d -> %d", O_old, self.max_objects)
        self._init_np_buffers()
        for name, v in self._b_views.items():
            v[:O_old] = old_views[name]
        self._b_n2[:O_old] = old_n2
        self._b_n3[:O_old] = old_n3
        (self._slot_of, self._slot_to_instance,
         self._prev_batch_slots, est_prev) = old_state
        if est_prev is not None:
            self._est_prev_dev = jnp.concatenate(
                [est_prev, jnp.zeros((self.max_objects - O_old, 10),
                                     jnp.float32)], axis=0)

    def _append_obs2d(self, inst, pose_cw, bbox, prob):
        slot = self._slot_for(inst)
        if slot is None:
            return
        i = int(self._b_n2[slot] % self.MAX_OBS2D)
        self._b_p2[slot, i] = pose_cw
        self._b_b2[slot, i] = bbox
        self._b_pr2[slot, i] = prob
        self._b_m2[slot, i] = 1.0
        self._b_n2[slot] += 1

    def _append_obs3d(self, inst, pose_wc, meas_vec10, prob):
        slot = self._slot_for(inst)
        if slot is None:
            return
        i = int(self._b_n3[slot] % self.MAX_OBS3D)
        self._b_p3[slot, i] = pose_wc
        self._b_me3[slot, i] = meas_vec10
        self._b_pr3[slot, i] = prob
        self._b_m3[slot, i] = 1.0
        self._b_n3[slot] += 1

    @staticmethod
    def _next_pow2(n, lo, hi):
        cap = lo
        while cap < min(n, hi):
            cap *= 2
        return cap

    def _get_unpack(self, O: int, M2t: int, M3t: int):
        """Unpack jit for an (object, observation)-capacity tier.

        The LM cost at these shapes is dominated by per-op tensor size
        (measured 8.1 ms at [24,512/256] vs 2.5 ms at [24,128/64] on
        v5e), so the batch is packed at the smallest power-of-two
        capacity that holds the current observation counts; tiers only
        grow (64/32 -> ... -> 512/256 on the observation axes,
        24 -> 48 -> ... on the object axis), each growth recompiling
        once.  ``O`` is passed explicitly because a prepared batch can
        outlive a tier growth (LM fusion defers dispatch by a frame).
        """
        key = ("unpack", O, M2t, M3t)
        fn = _SHARED_JIT.get(key)
        if fn is not None:
            return fn
        shapes = [("est0", (O, 10)), ("objmask", (O,)), ("useprev", (O,)),
                  ("p2", (O, M2t, 7)), ("b2", (O, M2t, 4)),
                  ("pr2", (O, M2t)), ("m2", (O, M2t)),
                  ("p3", (O, M3t, 7)), ("me3", (O, M3t, 10)),
                  ("pr3", (O, M3t)), ("m3", (O, M3t))]
        layout = []
        off = 0
        for name, shp in shapes:
            n = int(np.prod(shp))
            layout.append((name, off, shp))
            off += n

        @jax.jit
        def _unpack(flat, est_prev):
            out = {}
            for name, offi, shp in layout:
                n = int(np.prod(shp))
                arr = jax.lax.dynamic_slice(flat, (offi,), (n,)).reshape(shp)
                out[name] = arr
            est0 = jnp.where(out["useprev"][:, None] > 0.5, est_prev,
                             out["est0"])
            return ObjectObservations(
                est0=est0, obj_mask=out["objmask"] > 0.5,
                pose2d_cw=out["p2"], bbox2d=out["b2"], prob2d=out["pr2"],
                mask2d=out["m2"] > 0.5,
                pose3d_wc=out["p3"], meas3d=out["me3"], prob3d=out["pr3"],
                mask3d=out["m3"] > 0.5)

        _SHARED_JIT[key] = _unpack
        return _unpack

    @staticmethod
    def _lm_layout(O: int, M2t: int, M3t: int):
        """Hashable packed-batch layout: ((name, offset, shape), ...)."""
        shapes = [("est0", (O, 10)), ("objmask", (O,)), ("useprev", (O,)),
                  ("p2", (O, M2t, 7)), ("b2", (O, M2t, 4)),
                  ("pr2", (O, M2t)), ("m2", (O, M2t)),
                  ("p3", (O, M3t, 7)), ("me3", (O, M3t, 10)),
                  ("pr3", (O, M3t)), ("m3", (O, M3t))]
        layout = []
        off = 0
        for name, shp in shapes:
            layout.append((name, off, shp))
            off += int(np.prod(shp))
        return tuple(layout)

    def _pack_backend_batch(self):
        """Pack the current observation state into the flat f32 batch.

        Returns (flat np, est_prev device, M2t, M3t); also refreshes
        ``_slot_to_instance`` / ``_prev_batch_slots``.
        """
        self._slot_to_instance = []
        self._b_objmask[:] = 0.0
        self._b_useprev[:] = 0.0
        cur_slots = set()
        for inst in sorted(self.state.initialized_instances()):
            slot = self._slot_of.get(inst)
            if slot is None:
                continue
            cur_slots.add(slot)
            if slot in self._prev_batch_slots \
                    and self._est_prev_dev is not None:
                # warm start from the previous LM call's device output --
                # exactly the value a host drain would have re-uploaded
                self._b_useprev[slot] = 1.0
            else:
                self._b_est0[slot] = self.state.objects[inst].vec10.astype(
                    np.float32)
            self._b_objmask[slot] = 1.0
            self._slot_to_instance.append((slot, inst))
        self._prev_batch_slots = cur_slots
        est_prev = self._est_prev_dev
        if est_prev is None:
            est_prev = jnp.zeros((self.max_objects, 10), jnp.float32)

        # observation-capacity tier: ring buffers fill their prefix until
        # they wrap, so slicing [:, :Mt] covers every stored entry
        f2 = int(min(self._b_n2.max(initial=0), self.MAX_OBS2D))
        f3 = int(min(self._b_n3.max(initial=0), self.MAX_OBS3D))
        M2t = self._next_pow2(f2, 64, self.MAX_OBS2D)
        M3t = self._next_pow2(f3, 32, self.MAX_OBS3D)
        v = self._b_views
        flat_t = np.concatenate([
            v["est0"].ravel(), v["objmask"].ravel(), v["useprev"].ravel(),
            v["p2"][:, :M2t].ravel(), v["b2"][:, :M2t].ravel(),
            v["pr2"][:, :M2t].ravel(), v["m2"][:, :M2t].ravel(),
            v["p3"][:, :M3t].ravel(), v["me3"][:, :M3t].ravel(),
            v["pr3"][:, :M3t].ravel(), v["m3"][:, :M3t].ravel()])
        return flat_t, est_prev, self.max_objects, M2t, M3t

    def _build_backend_batch(self) -> ObjectObservations:
        flat_t, est_prev, O, M2t, M3t = self._pack_backend_batch()
        return self._get_unpack(O, M2t, M3t)(jnp.asarray(flat_t), est_prev)

    def restore_state(self, state: SlamState):
        """Resume from a checkpointed SlamState (system/checkpoint.py).

        Rebuilds the derived per-run structures the checkpoint does not
        carry: backend observation buffers (replayed in first-observation
        order, so slot assignment matches the original run), the
        incremental-init Gram matrices of uninitialized instances, and
        the association counter.  Call on a freshly constructed Tracking.
        """
        self.state = state
        self._init_np_buffers()

        def first_frame(rec):
            f2 = rec.obs2d_frame[0] if rec.obs2d_frame else 1 << 60
            f3 = rec.obs3d_frame[0] if rec.obs3d_frame else 1 << 60
            return min(f2, f3)

        for inst in sorted(state.objects,
                           key=lambda i: (first_frame(state.objects[i]), i)):
            rec = state.objects[inst]
            for pose_cw, pose_wc, bbox, prob in zip(
                    rec.obs2d_pose_cw, rec.obs2d_pose_wc, rec.obs2d_bbox,
                    rec.obs2d_prob):
                self._append_obs2d(inst, pose_cw, bbox, prob)
                if self.use_incremental_init and not rec.initialized:
                    self._inc_init.add_observation(inst, pose_wc, bbox)
            for pose_wc, meas, prob in zip(rec.obs3d_pose_wc, rec.obs3d_meas,
                                           rec.obs3d_prob):
                self._append_obs3d(inst, pose_wc, meas, prob)
        if state.objects:
            self.da_counter.seed(max(state.objects) + 1)

    def enable_distributed(self, mesh=None):
        """Shard the mapping-mode backend over a device mesh.

        Swaps ``_opt_fn`` for the observation-sharded distributed LM
        (``parallel/dist_lm.py``; identical iterates to the single-chip
        path up to f32 psum order).  The fixed observation capacities are
        powers of two, so any power-of-two mesh divides them evenly.
        """
        from ..parallel.dist_lm import optimize_objects_sharded
        from ..parallel.multihost import observation_mesh
        mesh = mesh if mesh is not None else observation_mesh()
        self._mesh = mesh

        def fn(obs, K, normal, gset, cfg):
            return optimize_objects_sharded(obs, K, normal, gset, mesh, cfg)

        self._opt_fn = jax.jit(fn, static_argnames=("cfg",))

    def _prepare_backend(self):
        """Pack the LM batch without dispatching (for LM fusion into the
        next frame's extraction program).  Returns the prep dict consumed
        by _dispatch_prepared / dispatch_with_lm + _finish_backend."""
        flat_t, est_prev, O, M2t, M3t = self._pack_backend_batch()
        gset = self.state.ground_plane is not None
        normal = (self.state.ground_plane[:3].astype(np.float32)
                  if gset else np.zeros(3, np.float32))
        # snapshot the per-instance observation counts NOW: the history row
        # written at drain time must pair frame-t estimates with frame-t
        # counts (RefreshObjectHistory semantics, Tracking.cpp:810-852)
        nobs = {inst: len(self.state.objects[inst].obs2d_bbox)
                for _, inst in self._slot_to_instance}
        return {"flat": flat_t, "est_prev": est_prev, "O": O, "M2t": M2t,
                "M3t": M3t, "gset": gset, "normal": normal, "nobs": nobs,
                "slots": list(self._slot_to_instance)}

    def _finish_backend(self, prep, est):
        """Post-dispatch bookkeeping shared by all LM dispatch paths."""
        # next LM call chains from this device array; the host copy (for
        # history/outputs) starts now and is drained once it has landed
        self._est_prev_dev = est
        if hasattr(est, "copy_to_host_async"):
            try:
                est.copy_to_host_async()
            except Exception:
                pass
        self._backend_calls += 1
        self._pending_backends.append(
            (self._backend_calls, est, prep["slots"], prep["nobs"]))
        if not self.pipelined:
            self._drain_ready_backends(all_pending=True)

    def _dispatch_prepared(self, prep):
        """Standalone LM dispatch of a prepared batch."""
        obs = self._get_unpack(prep["O"], prep["M2t"], prep["M3t"])(
            jnp.asarray(prep["flat"]), prep["est_prev"])
        est, chi2 = self._opt_fn(obs,
                                 jnp.asarray(self.K.astype(np.float32)),
                                 jnp.asarray(prep["normal"]),
                                 prep["gset"], self.lm_cfg)
        self._finish_backend(prep, est)

    def _run_backend(self):
        self._dispatch_prepared(self._prepare_backend())

    def _drain_ready_backends(self, all_pending: bool = False):
        """Apply pending backend results in dispatch order.

        Results are drained once their async host copies have had
        ``pipeline_depth`` further backend calls of time to land (or all
        of them, at sync points).
        """
        while self._pending_backends:
            age = self._backend_calls - self._pending_backends[0][0]
            if not all_pending and age < self.pipeline_depth:
                break
            _, est, slot_to_instance, nobs = self._pending_backends.popleft()
            est = np.asarray(est, np.float64)
            for slot, inst in slot_to_instance:
                self.state.objects[inst].vec10 = est[slot]
            self._refresh_history(nobs)
            if self.write_object_list:
                # per-optimizer-run dump (Optimizer.cpp:308-316)
                from ..io.writers import save_object_list
                insts = sorted(inst for _, inst in slot_to_instance)
                save_object_list(
                    self.object_list_path, insts,
                    np.stack([self._np_to_minimal(
                        self.state.objects[i].vec10) for i in insts]),
                    [self.state.objects[i].label for i in insts])

    def sync(self):
        """Flush the pipeline: process deferred frames in order, drain."""
        self._resolve_pending_plane()
        self._flushing = True
        try:
            while self._pending_extraction:
                self._process_frame_obs(*self._pending_extraction.popleft())
            self._drain_ready_backends(all_pending=True)
        finally:
            self._flushing = False

    # ------------------------------------------------------------------
    @staticmethod
    def _np_to_minimal(vec10):
        """Host-side vec10 -> vec9 (eager device ops cost ~ms each over the
        remote tunnel; this runs every frame per object)."""
        qx, qy, qz, qw = vec10[3:7]
        roll = np.arctan2(2 * (qw * qx + qy * qz), 1 - 2 * (qx * qx + qy * qy))
        pitch = np.arcsin(np.clip(2 * (qw * qy - qz * qx), -1.0, 1.0))
        yaw = np.arctan2(2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz))
        return np.concatenate([vec10[:3], [roll, pitch, yaw], vec10[7:]])

    def _refresh_history(self, nobs: Dict[int, int]):
        """Tracking.cpp:810-852 (nobs = obs counts at optimization time)."""
        for inst in sorted(nobs):
            rec = self.state.objects[inst]
            vec9 = self._np_to_minimal(rec.vec10)
            n_obs = nobs[inst]
            row = np.concatenate([[n_obs, 1], vec9])
            if rec.history and int(rec.history[-1][0]) == n_obs:
                rec.history[-1] = row
            else:
                rec.history.append(row)
