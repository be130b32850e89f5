"""Frame-batched (throughput/offline) extraction.

The reference processes frames strictly sequentially
(``/root/reference/src/core/Tracking.cpp:170-204``), but that ordering
is an artifact of its architecture, not a data dependency: single-frame
ellipsoid extraction (``EllipsoidExtractor::EstimateLocalEllipsoid``,
``/root/reference/src/pca/EllipsoidExtractor.cpp:292-493``) depends only
on (depth, bboxes, pose, latched ground plane) — never on map state.  In
mapping mode (poses fixed) extraction is therefore embarrassingly
parallel across frames.

Design: the detections of B frames are FLATTENED into the existing
detection-batched program (each detection gathers from its own frame's
depth image via a leading frame index) rather than vmapping the whole
single-frame program over a frame axis.  The single-frame program makes
scalar above-the-vmap decisions (compact-vs-full clustering,
convergence-bounded propagation); under a frame-axis vmap those
``lax.cond``s lower to select and BOTH branches execute — measured
~200 ms/frame vs ~10 ms online on the v5e (2026-08-21), a 20x
pathology.  Flattening keeps them scalar: one program of B frames costs
about what one online frame with B detections costs, amortizing both
the per-program dispatch latency and the per-HLO-op floor of tiny
shapes.

The host-side SLAM core (association → init → global BA) stays
sequential and order-dependent exactly like the online path; only the
extraction moves into batches (``system/offline.py`` drives it).  For
multi-chip, the detection axis is sharded over a mesh — pure data
parallelism, no cross-detection communication.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.camera import Camera
from .extractor import (ExtractorConfig, _cloud_tier, _cluster_select_batch,
                        _select_cluster_np, _stage_a_one, _stage_post_one,
                        _sym_finish_one)


def extract_local_ellipsoids_multi(depths, bboxes, frame_idx, run_mask,
                                   poses_wc, ground_plane, cam: Camera,
                                   cfg: ExtractorConfig, sym_types,
                                   need_single: bool, need_dual: bool,
                                   cluster_groups: int = 1):
    """Detection-batched estimation across MULTIPLE frames.

    depths: [B, H, W] int; bboxes: [D, 4]; frame_idx: [D] int (which
    frame each detection belongs to); run_mask: [D]; poses_wc: [B, 7];
    ground_plane: (4,) world.  Semantics per detection are identical to
    ``extract_local_ellipsoids`` on its own frame (the per-frame
    ``proj_depth``/``border`` maps are computed batched and gathered per
    detection).  Returns (local vec10 [D, 10], prob [D], valid [D]).
    """
    from ..ops import backproject as bp_mod

    depths = depths.astype(jnp.int32)
    bboxes = bboxes.astype(jnp.float32)
    poses_wc = poses_wc.astype(jnp.float32)
    ground_plane = ground_plane.astype(jnp.float32)

    # Stack the B depth maps as ONE [B*H, W] array and give each
    # detection its frame's row offset.  Keeping the gather operand
    # UNMAPPED 2D under the detection vmap is essential on this
    # toolchain: a per-detection [H, W] operand batches into a 3D
    # gather that executes ~10x slower (measured 17 ms vs ~2 ms per
    # detection, 2026-08-21).
    B, H, W = depths.shape
    depth_flat = depths.reshape(B * H, W)
    row0 = frame_idx * H
    hw = (H, W)
    pose_d = poses_wc[frame_idx]
    proj_flat = None
    border_flat = None
    if cfg.open_symmetry:
        proj_flat = jax.vmap(
            lambda d: bp_mod.proj_depth_map(d, cam))(depths).reshape(
                B * H, W)
        if cfg.sparse_symmetry:
            from ..ops import filters
            border_flat = jax.vmap(
                lambda d: filters.depth_border_mask(d, cam.scale))(
                    depths).reshape(B * H, W)

    a_fn = lambda b, p, r0: _stage_a_one(depth_flat, b, p, ground_plane,
                                         cam, cfg,
                                         border_map=border_flat,
                                         row0=r0, hw=hw)
    (pts_v, pts_w, cells_v, m2, center_w, ok_p, ok_c, battr_v) = \
        jax.vmap(a_fn)(bboxes, pose_d, row0)

    # Clustering.  A single whole-batch vmap pays max-over-batch
    # convergence rounds (the propagation while_loop runs until the
    # SLOWEST detection converges — measured ~6x mean rounds on cabinet
    # batches).  ``cluster_groups`` splits the detection axis into
    # groups scanned sequentially via lax.map, so each group pays only
    # its OWN rounds (the offline driver groups by frame); inside a
    # scan the compact-vs-full decision stays a real lax.cond.
    D = pts_w.shape[0]
    if cluster_groups > 1 and D % cluster_groups == 0:
        g = cluster_groups

        def cl_one(args):
            pv, pw, cv, m2g, cw = args
            return _cluster_select_batch(pv, pw, cv, m2g, cw, cam, cfg)

        sel, ok_cl = jax.lax.map(
            cl_one,
            (pts_v.reshape(g, D // g, *pts_v.shape[1:]),
             pts_w.reshape(g, D // g, *pts_w.shape[1:]),
             cells_v.reshape(g, D // g, *cells_v.shape[1:]),
             m2.reshape(g, D // g, *m2.shape[1:]),
             center_w.reshape(g, D // g, 3)))
        sel = sel.reshape(D, -1)
        ok_cl = ok_cl.reshape(D)
    else:
        sel, ok_cl = _cluster_select_batch(pts_v, pts_w, cells_v, m2,
                                           center_w, cam, cfg)

    def post(pts_w_i, sel_i, battr_i, bbox, run, sym_type, okp, okc,
             okcl, pose_i, r0):
        Two, pts_n, obj_m, sym_src = _stage_post_one(
            pts_w_i, sel_i, battr_i, pose_i, ground_plane, cam, cfg)
        valid = okp & okc & okcl
        return _sym_finish_one(
            Two, pts_n, obj_m, sym_src, valid & run, bbox, sym_type,
            pose_i, proj_flat, cam, cfg, need_single, need_dual,
            proj_row0=r0, proj_hw=hw)

    e_local, prob, ok, _, _, _ = jax.vmap(post)(
        pts_w, sel, battr_v, bboxes, run_mask,
        sym_types.astype(jnp.int32), ok_p, ok_c, ok_cl, pose_d, row0)
    return e_local, prob, ok


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "B",
                                   "need_single", "need_dual",
                                   "cluster_groups"))
def _extract_multi_packed(depths, flat, cam, cfg, pad, B, need_single,
                          need_dual, cluster_groups=1):
    """One-upload multi-frame extraction: ``flat`` packs
    [bboxes(pad,4) | frame_idx(pad) | run(pad) | sym_type(pad)
    | poses(B,7) | ground_plane(4)]; returns [pad, 12] (vec10, prob,
    valid) rows in detection order."""
    bb = flat[:pad * 4].reshape(pad, 4)
    fi = flat[pad * 4:pad * 5].astype(jnp.int32)
    run = flat[pad * 5:pad * 6] > 0.5
    st = flat[pad * 6:pad * 7].astype(jnp.int32)
    poses = flat[pad * 7:pad * 7 + 7 * B].reshape(B, 7)
    plane = flat[pad * 7 + 7 * B:pad * 7 + 7 * B + 4]
    e, p, v = extract_local_ellipsoids_multi(
        depths, bb, fi, run, poses, plane, cam, cfg, st, need_single,
        need_dual, cluster_groups=cluster_groups)
    return jnp.concatenate([e, p[:, None], v[:, None].astype(e.dtype)],
                           axis=1)


@partial(jax.jit, static_argnames=("cam", "cfg", "need_single",
                                   "need_dual"))
def _extract_multi_args(depths, bb, fi, run, st, poses, plane, cam, cfg,
                        need_single, need_dual):
    """Unpacked-argument variant for the sharded path (the detection
    axis carries a NamedSharding; a packed flat vector cannot)."""
    e, p, v = extract_local_ellipsoids_multi(
        depths, bb, fi.astype(jnp.int32), run > 0.5, poses, plane, cam,
        cfg, st.astype(jnp.int32), need_single, need_dual)
    return jnp.concatenate([e, p[:, None], v[:, None].astype(e.dtype)],
                           axis=1)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "B"))
def _extract_multi_phase_a(depths, flat, cam, cfg, pad, B):
    """Batched phase A of the split protocol: stages (a)-(c) for all
    detections of all B frames, one [pad, row] output for a single bulk
    host copy (row layout identical to ``_extract_phase_a``).

    The split protocol exists because on-device min-label clustering
    runs the whole batch until the SLOWEST detection converges — in a
    multi-frame batch that inflates cost ~2.4-6x (measured B=8 cabinet:
    60 ms/frame vs 25 mono, vs 16 with rounds clamped).  Host union-find
    (native/src/cluster.cpp) is exact, ~1.3 ms/frame, and overlaps the
    next batch's device phase A in the offline driver."""
    depths = depths.astype(jnp.int32)
    bb = flat[:pad * 4].reshape(pad, 4).astype(jnp.float32)
    fi = flat[pad * 4:pad * 5].astype(jnp.int32)
    poses = flat[pad * 7:pad * 7 + 7 * B].reshape(B, 7)
    plane = flat[pad * 7 + 7 * B:pad * 7 + 7 * B + 4]
    Bn, H, W = depths.shape
    depth_flat = depths.reshape(Bn * H, W)
    row0 = fi * H
    hw = (H, W)
    border_flat = None
    if cfg.open_symmetry and cfg.sparse_symmetry:
        from ..ops import filters
        border_flat = jax.vmap(
            lambda d: filters.depth_border_mask(d, cam.scale))(
                depths).reshape(Bn * H, W)
    pose_d = poses[fi]

    def one(bbox, p, r0):
        (_, pts_w, _, m2, center_w, okp, okc, battr_v) = _stage_a_one(
            depth_flat, bbox, p, plane, cam, cfg,
            border_map=border_flat, row0=r0, hw=hw)
        parts = [pts_w.reshape(-1), m2.astype(jnp.float32)]
        if battr_v is not None:
            parts.append(battr_v)
        parts.append(jnp.concatenate(
            [center_w, okp.astype(jnp.float32)[None],
             okc.astype(jnp.float32)[None]]))
        return jnp.concatenate(parts)

    return jax.vmap(one)(bb, pose_d, row0)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "B",
                                   "need_single", "need_dual"))
def _extract_multi_phase_b(depths, flat, a_out, sel_flat, cam, cfg, pad, B,
                           need_single, need_dual):
    """Batched phase B: stages (e)-(h) + symmetry from the host-selected
    clusters.  ``a_out`` is phase A's DEVICE buffer (no re-upload);
    ``flat``'s run lanes carry the final per-detection validity folded
    in by the host (points/center/cluster gates)."""
    depths = depths.astype(jnp.int32)
    bb = flat[:pad * 4].reshape(pad, 4).astype(jnp.float32)
    fi = flat[pad * 4:pad * 5].astype(jnp.int32)
    run = flat[pad * 5:pad * 6] > 0.5
    st = flat[pad * 6:pad * 7].astype(jnp.int32)
    poses = flat[pad * 7:pad * 7 + 7 * B].reshape(B, 7)
    plane = flat[pad * 7 + 7 * B:pad * 7 + 7 * B + 4]
    cap = cfg.cloud_capacity
    sparse = cfg.open_symmetry and cfg.sparse_symmetry
    Bn, H, W = depths.shape
    row0 = fi * H
    hw = (H, W)
    pose_d = poses[fi]
    proj_flat = None
    if cfg.open_symmetry:
        from ..ops import backproject as bp_mod
        proj_flat = jax.vmap(
            lambda d: bp_mod.proj_depth_map(d, cam))(depths).reshape(
                Bn * H, W)
    sel = sel_flat.reshape(pad, cap) > 0.5

    def one(bbox, run_i, sym_type, row, sel_i, p, r0):
        pts_w = row[:cap * 3].reshape(cap, 3)
        battr_v = row[cap * 4:cap * 5] if sparse else None
        Two, pts_n, obj_m, sym_src = _stage_post_one(
            pts_w, sel_i, battr_v, p, plane, cam, cfg)
        return _sym_finish_one(Two, pts_n, obj_m, sym_src, run_i, bbox,
                               sym_type, p, proj_flat, cam, cfg,
                               need_single, need_dual, proj_row0=r0,
                               proj_hw=hw)

    e, pr, ok, _, _, _ = jax.vmap(one)(bb, run, st, a_out, sel, pose_d,
                                       row0)
    return jnp.concatenate([e, pr[:, None], ok[:, None].astype(e.dtype)],
                           axis=1)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "B"))
def _extract_multi_phase_a_q(depths, flat, cam, cfg, pad, B):
    """Phase A + a QUANTIZED host-transfer companion (VERDICT r4 #4).

    The split protocol's bottleneck on the tunneled device is the bulk
    phase-A download (~2.1 MB of raw f32 at ~25 MB/s).  The host only
    needs (points, mask, center, flags) to run the native union-find and
    cluster selection, and 16-bit fixed point against each detection's
    own AABB resolves to sub-0.1 mm there — far inside the 2 cm cluster
    tolerance.  So this program additionally emits:

      q    [pad, cap, 3] u16 — points quantized per detection
                               (65535 = masked lane, folding the mask
                               into the payload)
      tail [pad, 11]     f32 — [lo(3), scale(3), center_w(3), okp, okc]

    and the host copies ONLY (q, tail) (~6 cap + 44 bytes/row, ~2.6x
    less than the f32 row); the full-precision ``a_out`` buffer stays
    on device for phase B, whose math is therefore UNCHANGED — only the
    host-side cluster/select sees quantized coordinates (error
    < half a quantization step, ~0.1 mm on room-scale AABBs)."""
    a_out = _extract_multi_phase_a(depths, flat, cam, cfg, pad, B)
    cap = cfg.cloud_capacity
    sparse = cfg.open_symmetry and cfg.sparse_symmetry
    pts = a_out[:, :cap * 3].reshape(pad, cap, 3)
    m2 = a_out[:, cap * 3:cap * 4] > 0.5
    tail0 = a_out[:, cap * (5 if sparse else 4):]        # [pad, 5]

    def quant_one(p, m, t5):
        big = jnp.float32(3.4e38)
        lo = jnp.min(jnp.where(m[:, None], p, big), axis=0)
        hi = jnp.max(jnp.where(m[:, None], p, -big), axis=0)
        any_m = jnp.any(m)
        lo = jnp.where(any_m, lo, 0.0)
        hi = jnp.where(any_m, hi, 1.0)
        scale = jnp.maximum((hi - lo) / 65534.0, 1e-9)
        q = jnp.clip(jnp.round((p - lo) / scale), 0, 65534)
        q = jnp.where(m[:, None], q, 65535.0).astype(jnp.uint16)
        return q, jnp.concatenate([lo, scale, t5[:3], t5[3:5]])

    q, tail = jax.vmap(quant_one)(pts, m2, tail0)
    return a_out, q, tail


def host_cluster_select_multi_q(batch: "FrameBatch", q_np: np.ndarray,
                                tail_np: np.ndarray):
    """Host middle stage on the QUANTIZED phase-A transfer: dequantize,
    native union-find, reference cluster selection.  Same contract as
    ``host_cluster_select_multi`` (returns (flat_b, sel_flat))."""
    from ..io.native_loader import cluster_labels

    cfg = batch.cfg
    pad = batch.pad
    cap = cfg.cloud_capacity
    sel_flat = np.zeros((pad, cap), np.float32)
    flat_b = batch.flat.copy()
    run = flat_b[pad * 5:pad * 6] > 0.5
    for i in range(pad):
        if not run[i]:
            flat_b[pad * 5 + i] = 0.0
            continue
        qi = q_np[i]
        m2 = qi[:, 0] != 65535
        lo, scale = tail_np[i, :3], tail_np[i, 3:6]
        center_w = tail_np[i, 6:9]
        okp, okc = tail_np[i, 9] > 0.5, tail_np[i, 10] > 0.5
        pts_w = (lo[None, :]
                 + qi.astype(np.float32) * scale[None, :]).astype(np.float32)
        pts_w[~m2] = 0.0
        labels = cluster_labels(pts_w, m2, cfg.cluster_tolerance)
        if labels is None:
            raise RuntimeError(
                "native cluster library unavailable; use the monolithic "
                "offline path (OfflineMapper(split=False))")
        sel, okcl = _select_cluster_np(
            pts_w, m2, labels, center_w, cfg.cluster_min_size,
            cfg.cluster_center_dis)
        sel_flat[i] = sel
        flat_b[pad * 5 + i] = float(okp and okc and okcl)
    return flat_b, sel_flat


def host_cluster_select_multi(batch: "FrameBatch", a_np: np.ndarray):
    """Host middle stage of the split protocol for a multi-frame batch:
    native grid-hash union-find labels + reference cluster selection per
    detection (identical semantics to ``_host_cluster_select``, adapted
    to the multi flat layout).  Returns (flat_b, sel_flat [pad, cap])."""
    from ..io.native_loader import cluster_labels

    cfg = batch.cfg
    cap = cfg.cloud_capacity
    sparse = cfg.open_symmetry and cfg.sparse_symmetry
    pad = batch.pad
    sel_flat = np.zeros((pad, cap), np.float32)
    flat_b = batch.flat.copy()
    run = flat_b[pad * 5:pad * 6] > 0.5
    for i in range(pad):
        if not run[i]:
            flat_b[pad * 5 + i] = 0.0
            continue
        row = a_np[i]
        pts_w = row[:cap * 3].reshape(cap, 3)
        m2 = row[cap * 3:cap * 4] > 0.5
        tail = row[cap * (5 if sparse else 4):]
        center_w, okp, okc = tail[:3], tail[3] > 0.5, tail[4] > 0.5
        labels = cluster_labels(pts_w, m2, cfg.cluster_tolerance)
        if labels is None:
            raise RuntimeError(
                "native cluster library unavailable; use the monolithic "
                "offline path (OfflineMapper(split=False))")
        sel, okcl = _select_cluster_np(
            pts_w, m2, labels, center_w, cfg.cluster_min_size,
            cfg.cluster_center_dis)
        sel_flat[i] = sel
        flat_b[pad * 5 + i] = float(okp and okc and okcl)
    return flat_b, sel_flat


@dataclasses.dataclass
class FrameBatch:
    """Host-packed batch ready for dispatch."""
    depths: np.ndarray          # [B, H, W] original depth dtype
    flat: np.ndarray            # [L] f32 (see _extract_multi_packed)
    cfg: ExtractorConfig        # tiered copy (common cloud capacity)
    pad: int                    # padded total-detection capacity
    B: int                      # number of frames
    need_s: bool
    need_d: bool
    slices: List[Tuple[int, int]]  # per-frame (row start, n detections)


def pack_frames_batch(cam: Camera, cfg: ExtractorConfig,
                      frames: Sequence[Tuple[np.ndarray, np.ndarray,
                                             np.ndarray, np.ndarray,
                                             np.ndarray]],
                      ground_plane: np.ndarray,
                      min_pad: int = 1) -> Optional[FrameBatch]:
    """Flatten B frames' detections into one packed batch.

    ``frames``: sequence of (depth, bboxes[N,4], labels[N], run_mask[N]
    bool, pose_wc7) — run gates (border / manual-association,
    Tracking.cpp:313-327) already applied by the caller.  Detections
    beyond the per-frame 32 cap keep 2D-only observations exactly like
    the online extractor.  The cloud tier is the per-batch maximum, so
    each frame's result is bit-identical to its own-tier sequential run
    (capacity is padding only; see _cloud_tier).
    """
    from .symmetry import sym_type_of_labels

    if ground_plane is None or not len(frames):
        return None
    tier = 1024
    need_s = need_d = False
    rows = []
    slices = []
    total = 0
    for depth, bboxes, labels, run, pose_wc in frames:
        n = min(len(bboxes), 32)
        st = (sym_type_of_labels(labels[:n]).astype(np.int64) if n
              else np.zeros(0, np.int64))
        need_s = need_s or bool((st == 1).any())
        need_d = need_d or bool((st == 2).any())
        tier = max(tier, _cloud_tier(bboxes[:n], run[:n], cam.height,
                                     cam.width, cfg.cloud_capacity))
        rows.append((depth, bboxes, st, run, pose_wc, n))
        slices.append((total, n))
        total += n
    # min_pad: the offline driver pins it to batch_size so sparse tail
    # batches reuse the full batches' compiled program shapes
    pad = 1
    while pad < max(total, min_pad):
        pad *= 2
    B = len(rows)

    flat = np.zeros(pad * 7 + 7 * B + 4, np.float32)
    depths = np.stack([r[0] for r in rows])
    for b, (depth, bboxes, st, run, pose_wc, n) in enumerate(rows):
        s = slices[b][0]
        if n:
            flat[s * 4:(s + n) * 4] = np.asarray(bboxes[:n],
                                                 np.float32).ravel()
            flat[pad * 4 + s:pad * 4 + s + n] = b
            flat[pad * 5 + s:pad * 5 + s + n] = run[:n].astype(np.float32)
            flat[pad * 6 + s:pad * 6 + s + n] = st
        flat[pad * 7 + 7 * b:pad * 7 + 7 * (b + 1)] = pose_wc
    flat[pad * 7 + 7 * B:] = ground_plane
    # bbox slots are interleaved per detection, but the bbox block is
    # [pad, 4] row-major so the flattened assignment above is per-row
    cfg_t = (cfg if tier == cfg.cloud_capacity
             else dataclasses.replace(cfg, cloud_capacity=tier))
    return FrameBatch(depths=depths, flat=flat, cfg=cfg_t, pad=pad, B=B,
                      need_s=need_s, need_d=need_d, slices=slices)


def dispatch_batch_phase_a(batch: FrameBatch, cam: Camera,
                           quantized: bool = False):
    """Dispatch the batched phase A; returns the handle phase B consumes
    (async host copies started — fetch one batch later).

    ``quantized``: emit the u16 fixed-point host transfer
    (_extract_multi_phase_a_q) and async-copy ONLY it; the f32 buffer
    never crosses the link (handle = (a_out, q, tail))."""
    if quantized:
        a_out, q, tail = _extract_multi_phase_a_q(
            jnp.asarray(batch.depths), jnp.asarray(batch.flat), cam,
            batch.cfg, batch.pad, batch.B)
        for arr in (q, tail):
            try:
                arr.copy_to_host_async()
            except Exception:
                pass
        return (a_out, q, tail)
    out = _extract_multi_phase_a(jnp.asarray(batch.depths),
                                 jnp.asarray(batch.flat), cam, batch.cfg,
                                 batch.pad, batch.B)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out


def dispatch_batch_phase_b(batch: FrameBatch, a_handle, cam: Camera):
    """Host-cluster phase A's (landed) transfer, dispatch the batched
    phase B; returns the [pad, 12] device result.  ``a_handle`` is
    ``dispatch_batch_phase_a``'s return value (f32 buffer, or the
    quantized (a_out, q, tail) triple)."""
    if isinstance(a_handle, tuple):
        a_out, q, tail = a_handle
        flat_b, sel = host_cluster_select_multi_q(
            batch, np.asarray(q), np.asarray(tail))
    else:
        a_out = a_handle
        flat_b, sel = host_cluster_select_multi(batch, np.asarray(a_out))
    out = _extract_multi_phase_b(
        jnp.asarray(batch.depths), jnp.asarray(flat_b), a_out,
        jnp.asarray(sel.reshape(-1)), cam, batch.cfg, batch.pad, batch.B,
        batch.need_s, batch.need_d)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out


def dispatch_batch(batch: FrameBatch, cam: Camera, mesh=None,
                   axis: str | None = None):
    """Dispatch one batched extraction program; returns the [pad, 12]
    device array (async host copy already started).

    With ``mesh``, the DETECTION axis is sharded over the mesh's first
    (or named) axis — data parallelism; detections never communicate, so
    results match the unsharded program up to compile-level f32 jitter.
    The detection pad must be divisible by the axis size (both are
    powers of two; tiny batches fall back to unsharded).
    """
    depths = jnp.asarray(batch.depths)
    if mesh is None:
        # group the clustering scan by frame (per-group own convergence
        # rounds; see extract_local_ellipsoids_multi)
        g = batch.B
        while batch.pad % g != 0:
            g //= 2
        out = _extract_multi_packed(depths, jnp.asarray(batch.flat), cam,
                                    batch.cfg, batch.pad, batch.B,
                                    batch.need_s, batch.need_d,
                                    cluster_groups=g)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = axis or mesh.axis_names[0]
        n_shard = mesh.shape[ax]
        pad, B = batch.pad, batch.B
        f = batch.flat
        bb = f[:pad * 4].reshape(pad, 4)
        fi = f[pad * 4:pad * 5]
        run = f[pad * 5:pad * 6]
        st = f[pad * 6:pad * 7]
        poses = f[pad * 7:pad * 7 + 7 * B].reshape(B, 7)
        plane = f[pad * 7 + 7 * B:]
        if pad % n_shard == 0:
            det = NamedSharding(mesh, P(ax))
            rep = NamedSharding(mesh, P())
            bb = jax.device_put(jnp.asarray(bb), det)
            fi = jax.device_put(jnp.asarray(fi), det)
            run = jax.device_put(jnp.asarray(run), det)
            st = jax.device_put(jnp.asarray(st), det)
            depths = jax.device_put(depths, rep)
            poses = jax.device_put(jnp.asarray(poses), rep)
            plane = jax.device_put(jnp.asarray(plane), rep)
        out = _extract_multi_args(depths, jnp.asarray(bb), jnp.asarray(fi),
                                  jnp.asarray(run), jnp.asarray(st),
                                  jnp.asarray(poses), jnp.asarray(plane),
                                  cam, batch.cfg, batch.need_s,
                                  batch.need_d)
    try:
        out.copy_to_host_async()
    except Exception:
        pass
    return out
