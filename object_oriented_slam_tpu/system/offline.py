"""Offline (throughput/batch) mapping mode.

The online loop is latency-bound: one extraction program per frame on
tiny tensors leaves the chip ~idle (BENCH_r03: extraction MFU 0.008 %).
In mapping mode the per-frame sequencing of the reference
(``/root/reference/src/core/Tracking.cpp:170-204``) is an architectural
artifact — extraction depends only on (pose, depth, latched ground
plane) — so this driver processes a recorded sequence by:

  1. bootstrapping the ground plane through the normal per-frame path
     (state machine semantics identical to online, Tracking.cpp:716-799),
  2. flattening every subsequent B frames' detections into batched
     device programs (``frontend/batch_extractor.py``),
  3. pipelining batches so device compute and bulk transfers overlap
     (default: ONE monolithic program per batch; the split protocol —
     device phase A -> host native union-find -> device phase B —
     is opt-in for low-latency links, see __init__), and
  4. feeding results into the UNCHANGED sequential SLAM core
     (association -> init -> per-frame global BA) in frame order.

Results match the online path (same per-frame inputs and processing
order; the batch axis is pure vmap) — see tests/test_offline_batch.py.
"""
from __future__ import annotations

import time
from collections import deque
from typing import Iterable, Optional

import numpy as np

from ..frontend.batch_extractor import (dispatch_batch,
                                        dispatch_batch_phase_a,
                                        dispatch_batch_phase_b,
                                        pack_frames_batch)


class OfflineMapper:
    """Drives a ``System`` over a recorded sequence in batch mode.

    ``ext_cfg``/``cam`` are the same objects the online extractor was
    built with (the batched programs share its tier semantics).

    ``split``: opt-in device-A / host-cluster / device-B protocol
    (requires the native cluster library).  It moves clustering off the
    device entirely but fetches a ~2 MB phase-A buffer per batch — a
    win on low-latency links, a loss on the tunneled device (~25 MB/s
    D2H), hence the monolithic default whose per-frame-group lax.map
    clustering already avoids the max-over-batch convergence-round
    inflation.  ``mesh`` (data parallelism over the detection axis)
    currently implies the monolithic program.
    """

    def __init__(self, system, cam, ext_cfg, batch_size: int = 8,
                 mesh=None, with_association: bool = True,
                 split: Optional[bool] = None, queue_depth: int = 2,
                 backend_per_batch: bool = True,
                 split_quant: bool = True):
        self.system = system
        self.cam = cam
        self.ext_cfg = ext_cfg
        self.batch_size = int(batch_size)
        self.mesh = mesh
        self.with_association = with_association
        # batches of slack between a stage's dispatch and the fetch of
        # its result: the phase-A bulk copy (~2 MB) runs at ~25 MB/s on
        # the tunneled device (~77 ms measured), so it needs ~2 batches
        # of device compute to stream in the background
        self.queue_depth = max(1, int(queue_depth))
        if split is None:
            # monolithic by default: the split protocol's bulk phase-A
            # download (2.1 MB/batch) runs at ~25 MB/s on the tunneled
            # device and does not overlap compute there; on low-latency
            # links with the native library, split=True moves the
            # clustering to the host and off the device entirely
            split = False
        if split:
            from ..io.native_loader import native_available
            split = native_available()
        self.split = split and mesh is None
        # u16 fixed-point phase-A transfer (batch_extractor
        # _extract_multi_phase_a_q): ~2.6x smaller bulk download, host
        # clustering sees <0.1 mm quantization error
        self.split_quant = bool(split_quant)
        # One global-BA program per BATCH (on its last frame) instead of
        # per frame: each device program costs a 5-30 ms fixed overhead
        # on the tunneled device, so the 8 per-frame LM programs of a
        # batch dominate its cost.  The final map solves the identical
        # full graph (LM warm start differs mid-run only); per-frame
        # optimization (the reference's schedule, Tracking.cpp:225-229)
        # remains available with backend_per_batch=False, and the
        # per-frame object_history granularity coarsens to per-batch.
        self.backend_per_batch = backend_per_batch
        self.batches_dispatched = 0

    def run(self, frames: Iterable, progress: Optional[callable] = None):
        """Process all frames; returns {frames, seconds, fps, batches}."""
        tracker = self.system.tracker
        # Backend results drain once they are pipeline_depth calls old;
        # at the online default (4) a drain blocks behind the LATER
        # extraction batches already queued on the device (each ~80 ms),
        # serializing the whole pipeline.  Offline, history rows are
        # needed only at the end — let drains lag several batches (the
        # LM chain warm-starts on device, so nothing downstream waits).
        prev_depth, prev_adapt = tracker.pipeline_depth, \
            tracker.adaptive_depth
        tracker.pipeline_depth = max(prev_depth, 4 * self.batch_size)
        tracker.adaptive_depth = False
        # blocking plane bootstrap: the offline driver fully drains
        # between bootstrap frames anyway, so the async one-shot deferral
        # only delays the switch to the batched path by a frame
        prev_async = tracker.async_plane
        tracker.async_plane = False
        try:
            return self._run(tracker, frames, progress)
        finally:
            tracker.pipeline_depth = prev_depth
            tracker.adaptive_depth = prev_adapt
            tracker.async_plane = prev_async

    def _run(self, tracker, frames, progress):
        t0 = time.perf_counter()
        n = 0
        bucket = []        # frames accumulating toward one batch
        stage_a = deque()  # (recs, FrameBatch, a_out device buffer)
        stage_b = deque()  # (recs, FrameBatch, result device buffer)

        def advance_a():
            """Oldest phase-A batch: host-cluster + dispatch phase B.
            Its async copy has had a full batch of device time to land."""
            recs, fb, a_out = stage_a.popleft()
            out = dispatch_batch_phase_b(fb, a_out, self.cam)
            stage_b.append((recs, fb, out))

        def consume_b():
            recs, fb, out = stage_b.popleft()
            out_np = np.asarray(out)  # one bulk fetch per batch
            # zip stops at the real frames; dummy pad frames (stable
            # program shapes for partial tail batches) are ignored
            opt_base = tracker.open_optimization
            for k, ((s, nn), (ts, pose, det, d)) in enumerate(
                    zip(fb.slices, recs)):
                if self.backend_per_batch:
                    tracker.open_optimization = (
                        opt_base and k == len(recs) - 1)
                tracker.grab_pose_and_objects(
                    ts, pose, det, d,
                    with_association=self.with_association,
                    ext_result=out_np[s:s + nn])
            tracker.open_optimization = opt_base

        def flush_bucket():
            if not bucket:
                return
            recs = list(bucket)
            bucket.clear()
            packed = [(d, det[:, 1:5], det[:, 5].astype(int),
                       tracker.run_gates(det, self.with_association), pose)
                      for (_, pose, det, d) in recs]
            # pad partial batches to the full batch size with empty
            # dummy frames: every batch then reuses the same compiled
            # (B, pad, tier) program instead of compiling a one-off
            # shape per fragment (a fragmented cabinet run compiled 6
            # distinct A+B program pairs at 2-60 s each)
            while len(packed) < self.batch_size:
                packed.append((np.zeros_like(packed[0][0]),
                               np.zeros((0, 4)), np.zeros(0, int),
                               np.zeros(0, bool), packed[0][4]))
            fb = pack_frames_batch(
                self.cam, self.ext_cfg, packed,
                tracker.state.ground_plane, min_pad=self.batch_size)
            if self.split:
                stage_a.append((recs, fb,
                                dispatch_batch_phase_a(
                                    fb, self.cam,
                                    quantized=self.split_quant)))
                if len(stage_a) > self.queue_depth:
                    advance_a()
                if len(stage_b) > self.queue_depth:
                    consume_b()
            else:
                out = dispatch_batch(fb, self.cam, mesh=self.mesh)
                stage_b.append((recs, fb, out))
                if len(stage_b) > self.queue_depth:
                    consume_b()
            self.batches_dispatched += 1

        def drain():
            flush_bucket()
            while stage_a:
                advance_a()
            while stage_b:
                consume_b()

        for i, ts, pose, depth, rgb, det in frames:
            n += 1
            det = (np.asarray(det, np.float64).reshape(-1, 8)
                   if det is not None and np.asarray(det).size
                   else np.zeros((0, 8)))
            if tracker.state.ground_state != 2 or depth is None:
                # ground-plane bootstrap / depth-free frames go through
                # the normal per-frame path, in order
                drain()
                tracker.grab_pose_and_objects(
                    ts, pose, det, depth,
                    with_association=self.with_association)
            else:
                # detection-free or fully gated frames ride the batch
                # too (zero extraction rows) so batch shapes stay stable
                bucket.append((ts, pose, det, depth))
                if len(bucket) >= self.batch_size:
                    flush_bucket()
            if progress is not None:
                progress(i)
        drain()
        tracker.sync()
        dt = time.perf_counter() - t0
        return {"frames": n, "seconds": dt,
                "fps": (n / dt if dt > 0 else 0.0),
                "batches": self.batches_dispatched}
