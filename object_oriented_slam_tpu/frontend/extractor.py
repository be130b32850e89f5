"""Single-frame ellipsoid extraction (the dense per-frame hot loop).

TPU-native re-design of ``EllipsoidExtractor::EstimateLocalEllipsoid``
(``/root/reference/src/pca/EllipsoidExtractor.cpp:292-493``), processing
ALL detections of a frame as one batched jitted program (the reference
loops detections on the CPU with PCL):

  (a) strided bbox depth back-projection, 1 cm voxel downsample, transform
      to world (ExtractPointCloud, :86-168)
  (b) supporting-plane filter keeps points > 5 cm above ground (:562-578)
  (c) 10x10-sample object-center estimate (GetCenter, :583-643)
  (d) Euclidean clustering, select cluster near the center estimate
      (ApplyEuclideanFilter, :646-737) -- grid-free min-label propagation
      replaces the PCL KdTree
  (e) PCA + chirality fix + z-to-gravity alignment + exact normal
      calibration (:170-196, 207-267, 760-788)
  (f) normalized object frame (x from PCA, z from ground normal), 0.1 m
      downsample of the object cloud (:321-347)
  (g) optional symmetry completion (frontend/symmetry.py)
  (h) scale from max |coord| per axis in the normalized frame
      (ProcessPCANormalized, :495-531); result returned camera-local with
      the symmetry probability attached (:459-492)

Failure gates (miSystemState analogues) are carried as a validity mask.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import plane as plane_mod
from ..core import se3
from ..core.camera import Camera
from ..ops import backproject as bp
from ..ops import cluster as cl
from ..ops import pca as pca_mod
from ..ops import voxel as vx


@dataclasses.dataclass(frozen=True)
class ExtractorConfig:
    depth_range: float = 6.0                # EllipsoidExtractor_DEPTH_RANGE
    voxel_leaf: float = 0.01                # ExtractPointCloud downsample
    plane_clearance: float = 0.05           # supporting-plane filter
    cluster_tolerance: float = 0.02         # EllipsoidExtraction.Euclidean.*
    cluster_min_size: int = 100
    cluster_center_dis: float = 0.5
    sym_grid: float = 0.1                   # EllipsoidExtraction.Symmetry.GridSize
    cloud_capacity: int = 16384  # post-voxel budget.  8192 silently
                                 # truncated the 11-13k-voxel clouds of
                                 # near-camera cabinet frames (33-39) to
                                 # ~65%, biasing PCA center/scale by
                                 # ~0.1 m vs the f64 oracle (round-3
                                 # sweep); the per-frame pow2 tiering
                                 # keeps small frames on small programs
    sym_capacity: int = 512                 # post-0.1-downsample budget
    cluster_iters: int = 96   # convergence bound only: rounds stop early
                              # once labels settle (ops/cluster.py), so
                              # raising it is free on converged frames.
                              # 16 was too low: cabinet frames 23-50
                              # need ~30-60 rounds (environment-
                              # dependent: borderline f32 adjacency
                              # shifts the count) and a truncated run
                              # selects a FRAGMENT (0.1-0.2 m center
                              # error vs the f64 oracle; round-3 sweep +
                              # frame-45 analysis).  A truncated run now
                              # also FAILS the validity gate instead of
                              # passing silently (_cluster_select_batch)
    cluster_chains: int = -1  # -1 (default) = one chain-seed order, no
                              # interleave.  K>0 seeds K spatial orders
                              # AND interleaves chain passes between
                              # dense min-label rounds — cuts dense
                              # rounds 7-15 -> 4-7 in simulation, but
                              # MEASURED NET-NEGATIVE on the v5e (+1-2
                              # ms/frame at both 8192/16384 tiers: a
                              # chain pass's 2 gathers + 2 log-depth
                              # segmented scans cost about one dense
                              # pass on this latency-dominated device).
                              # Kept selectable for low-op-latency
                              # devices; see BENCH_DETAILS round 5.
    compact_tiers: bool = True  # compaction-capacity ladder
                                # {4,5,6,7,8,12}·N/16 (1024-aligned
                                # rungs; 1024-row pass block on the
                                # non-2048-aligned ones) instead of
                                # half-N-only: each frame's clustering
                                # pays the smallest rung that holds its
                                # survivors — quadratic pass cost, so
                                # the 5120-7168 rungs the 5-6.6k-
                                # survivor cabinet frames land on are
                                # 22-61 % cheaper than the old 8192.
                                # Labels identical at every rung
                                # (VERDICT r4 #3; A/B BENCH_DETAILS r5)
    compact_rungs: tuple = (4, 5, 6, 7, 8, 12)  # ladder caps in
                                # sixteenths of N (1024-alignment
                                # filtered per tier); (4, 6, 8, 12) is
                                # the pre-r5b coarse ladder, kept
                                # selectable for A/Bs
    grid_cluster: bool = False  # O(N*C) grid-hash clustering — exact and
                                # asymptotically better, but the remote
                                # TPU toolchain pathologizes its gathers
                                # (>30 min Mosaic/XLA compiles, ~200 ms
                                # steady-state frames vs ~10 ms dense,
                                # measured 2026-08-20); fast on CPU.
                                # See BENCH_DETAILS.md "grid clustering".
    open_symmetry: bool = False
    sparse_symmetry: bool = False  # mirror only depth-border points in the
                                   # symmetry cost (Symmetry::SetBorders
                                   # path; inactive in the reference demo)
    sym_analytic_grad: bool = True  # False = the reference-faithful
                                    # central-difference plane jacobians
                                    # (SymmetryConfig.analytic_grad);
                                    # iterate gap quantified in
                                    # BENCH_DETAILS (oracle_sweep
                                    # --variants dual_numeric,...)


def _grid_clustering_ok(cam: Camera, cfg: ExtractorConfig) -> bool:
    """Static gate for the O(N*C) grid-hash clustering path: the voxel
    cells are unique per point by construction, and the largest possible
    camera-frame cloud span (the depth_range frustum) must fit the key
    packing."""
    span = max(cfg.depth_range,
               cfg.depth_range * cam.width / cam.fx,
               cfg.depth_range * cam.height / cam.fy)
    return cfg.grid_cluster and cl.grid_supported(
        cfg.cluster_tolerance, cfg.voxel_leaf, span)


def _stage_a_one(depth, bbox, pose_wc, ground_plane, cam: Camera,
                 cfg: ExtractorConfig, border_map=None, row0=0, hw=None):
    """Stages (a)-(c) of one detection: bbox cloud -> voxel -> world,
    supporting-plane filter, center estimate.

    Returns (pts_v camera-frame voxel cloud, pts_w world cloud, cells_v,
    m2 filtered mask, center_w, ok_points, ok_center, battr_v | None).

    ``row0``/``hw``: multi-frame batches pass depth as one stacked
    [B*H, W] array with per-detection row offsets so the gather operand
    stays unmapped 2D under the detection vmap (ops/backproject.py).
    """
    # (a) bbox cloud -> voxel -> world
    pts_cam, m0 = bp.bbox_point_cloud(depth, bbox, cam, cfg.depth_range,
                                      row0=row0, hw=hw)
    battr_v = None
    if border_map is not None:
        battr0 = bp.bbox_pixel_lookup(border_map, bbox, row0=row0, hw=hw)
        pts_v, battr_v, cells_v, m1 = vx.voxel_downsample_full(
            pts_cam, battr0, m0, cfg.voxel_leaf, cfg.cloud_capacity)
    else:
        pts_v, cells_v, m1 = vx.voxel_downsample_cells(
            pts_cam, m0, cfg.voxel_leaf, cfg.cloud_capacity)
    R_wc = se3.quat_to_mat(pose_wc[3:])
    pts_w = pts_v @ R_wc.T + pose_wc[:3]

    # (b) supporting-plane filter (EllipsoidExtractor.cpp:562-578)
    dist = plane_mod.distance_to_point(ground_plane, pts_w, keep_flag=True)
    m2 = m1 & (dist > cfg.plane_clearance)
    ok_points = jnp.sum(m2) >= 1

    # (c) center estimate (world)
    center_cam, ok_center = bp.center_estimate(depth, bbox, cam,
                                               cfg.depth_range,
                                               row0=row0, hw=hw)
    center_w = R_wc @ center_cam + pose_wc[:3]
    return (pts_v, pts_w, cells_v, m2, center_w, ok_points, ok_center,
            battr_v)


def _stage_post_one(pts_w, sel, battr_v, pose_wc, ground_plane,
                    cam: Camera, cfg: ExtractorConfig):
    """Stages (e)-(f) after cluster selection: PCA, rotation
    post-processing, normalized object frame, 0.1 m object-cloud
    downsample.  Returns (Two, pts_n, obj_m, sym_src)."""
    # (e) PCA + rotation post-processing
    res = pca_mod.masked_pca(pts_w, sel)
    rot = pca_mod.adjust_chirality(res.rot)
    normal = ground_plane[:3] / jnp.maximum(
        jnp.linalg.norm(ground_plane[:3]), 1e-9)
    rot, vals = pca_mod.align_z_to_gravity(rot, res.eigvals, normal)
    rot = pca_mod.calibrate_to_normal(rot, normal)

    # (f) normalized object frame: x from PCA, z from ground normal
    rz = normal
    rx = rot[:, 0] / jnp.maximum(jnp.linalg.norm(rot[:, 0]), 1e-9)
    ry = jnp.cross(rz, rx)
    R_wo = jnp.stack([rx, ry, rz], axis=1)
    q_wo = se3.mat_to_quat(R_wo)
    Two = jnp.concatenate([res.center, q_wo])

    # 0.1 m downsample of the object cloud for symmetry + scale stats
    # (EllipsoidExtractor.cpp:321-324: downsample happens in world frame,
    # then the cloud is moved to the normalized frame)
    if battr_v is not None:
        obj_pts, obj_battr, obj_m = vx.voxel_downsample_attrs(
            pts_w, battr_v, sel, cfg.sym_grid, cfg.sym_capacity)
        sym_src = obj_m & (obj_battr > 0.3)
        # degenerate border sets (e.g. fully interior view) fall back to
        # the dense cost rather than a zero-point average
        sym_src = jnp.where(jnp.any(sym_src), sym_src, obj_m)
    else:
        obj_pts, obj_m = vx.voxel_downsample(pts_w, sel, cfg.sym_grid,
                                             cfg.sym_capacity)
        sym_src = None
    Tow = se3.se3_inv(Two)
    R_ow = se3.quat_to_mat(Tow[3:])
    pts_n = obj_pts @ R_ow.T + Tow[:3]
    pts_n = jnp.where(obj_m[:, None], pts_n, 0.0)
    return Two, pts_n, obj_m, sym_src


def _ladder_caps(N: int, cfg: ExtractorConfig):
    """Compaction-ladder rungs for an ``N``-lane cloud tier: ``[(cap,
    pass_block), ...]`` ascending.  Rungs come from ``cfg.compact_rungs``
    (sixteenths of N); caps divisible by 2048 tile at the measured-best
    default pass block (ops.cluster._BLOCK), remaining 1024-aligned caps
    tile at 1024 rows, anything finer is dropped (pad-free tiling only —
    labels are tiling-invariant either way)."""
    if not cfg.compact_tiers:
        return [(N // 2, None)]
    caps = []
    for k in sorted(cfg.compact_rungs):
        c = (k * N) // 16
        if c % 2048 == 0 and c >= 2048:
            caps.append((c, None))
        elif c % 1024 == 0 and c >= 1024:
            caps.append((c, 1024))
    return caps


def _cluster_select_batch(pts_v, pts_w, cells_v, m2, center_w,
                          cam: Camera, cfg: ExtractorConfig):
    """Stage (d) for the whole detection batch, with the compact-vs-full
    clustering decision hoisted OUTSIDE the vmap.

    Inside a vmap, lax.cond lowers to select and both branches execute
    (measured +38% instead of the intended ~4x win); deciding once per
    frame on max survivors across detections keeps the cond a real
    conditional.  Labels are identical either way
    (ops/cluster.components_compacted's stable index mapping).
    """
    tol, it = cfg.cluster_tolerance, cfg.cluster_iters
    if _grid_clustering_ok(cam, cfg):
        labels, conv = jax.vmap(
            lambda gp, gc, m: cl.connected_components_grid(
                gp, gc, m, tol, cfg.voxel_leaf, outer_iters=it,
                with_converged=True))(pts_v, cells_v, m2)
    else:
        N = pts_w.shape[1]
        ch = cfg.cluster_chains
        vm_full = jax.vmap(lambda p, m: cl.connected_components(
            p, m, tol, outer_iters=it, with_converged=True, chains=ch))
        if N >= 4096:
            def vm_comp_at(cap, block):
                return jax.vmap(lambda p, m: cl.components_compacted(
                    p, m, tol, it, 12, cap, with_converged=True,
                    chains=ch, block=block))
            maxs = jnp.max(jnp.sum(m2, axis=1))
            # compaction-capacity LADDER: smallest rung (see
            # _ladder_caps) that holds the frame's survivors.  Pass
            # cost is quadratic in the cap, so each finer tier cuts
            # the dominant device stage vs the next; cabinet
            # near-camera frames carry 5.0-6.6k survivors at the
            # 16384 tier -> the 5120-7168 rungs, where the old
            # half-N-only compaction paid 8192^2.  Labels are
            # identical at every rung (components_compacted's stable
            # index mapping).  Reference hot loop:
            # EllipsoidExtractor.cpp:646-737 (PCL KdTree clustering).
            caps = _ladder_caps(N, cfg)

            def ladder(k):
                if k >= len(caps):
                    return vm_full(pts_w, m2)
                cap, blk = caps[k]
                return jax.lax.cond(
                    maxs <= cap,
                    lambda _: vm_comp_at(cap, blk)(pts_w, m2),
                    lambda _: ladder(k + 1), None)

            labels, conv = ladder(0)
        else:
            labels, conv = vm_full(pts_w, m2)
    sel, ok = jax.vmap(lambda p, m, l, c: cl.select_cluster(
        p, m, l, c, cfg.cluster_min_size, cfg.cluster_center_dis))(
        pts_w, m2, labels, center_w)
    # an iteration-bound-truncated propagation yields FRAGMENT components
    # that can pass every downstream gate with a biased center/scale
    # (round-3 oracle sweep) — surface it as extraction failure instead
    return sel, ok & conv


def _finish_one(Two, pts_n, obj_m, pose_wc):
    """(h) scale from normalized stats; assemble camera-local ellipsoid."""
    _, mx = pca_mod.normalized_frame_stats(pts_n, obj_m)
    e_world = jnp.concatenate([Two, mx])
    # world -> camera-local (transform_from with inverse pose,
    # EllipsoidExtractor.cpp:465-469)
    Tcw = se3.se3_inv(pose_wc)
    pose_local = se3.se3_mul(Tcw, Two)
    return jnp.concatenate([pose_local, mx]), e_world


@partial(jax.jit, static_argnames=("cam", "cfg", "need_single",
                                   "need_dual"))
def extract_local_ellipsoids(depth, bboxes, run_mask, pose_wc, ground_plane,
                             cam: Camera, cfg: ExtractorConfig,
                             sym_types=None, need_single: bool = True,
                             need_dual: bool = True):
    """Batched single-frame estimation over all detections.

    depth: [H, W] int32; bboxes: [D, 4]; run_mask: [D]; pose_wc: (7,);
    ground_plane: (4,) world frame; sym_types: [D] int {0 none,
    1 reflection, 2 dual} (only used when cfg.open_symmetry).
    ``need_single``/``need_dual`` are static flags the host derives from
    the frame's labels so only the required symmetry variant is computed
    (lax.cond would execute both branches under vmap).
    Returns (local vec10 [D, 10], prob [D], valid [D], debug tuple).
    """
    depth = depth.astype(jnp.int32)
    bboxes = bboxes.astype(jnp.float32)
    pose_wc = pose_wc.astype(jnp.float32)
    ground_plane = ground_plane.astype(jnp.float32)
    if sym_types is None:
        sym_types = jnp.zeros(bboxes.shape[0], jnp.int32)

    border_map = None
    proj_depth = None
    if cfg.open_symmetry:
        from ..ops import backproject as bp_mod
        proj_depth = bp_mod.proj_depth_map(depth, cam)
        if cfg.sparse_symmetry:
            from ..ops import filters
            border_map = filters.depth_border_mask(depth, cam.scale)

    # stages (a)-(c) per detection, then the clustering stage with its
    # compact/full decision hoisted out of the vmap, then (e)-(h)
    (pts_v, pts_w, cells_v, m2, center_w, ok_p, ok_c, battr_v) = jax.vmap(
        lambda b: _stage_a_one(depth, b, pose_wc, ground_plane, cam, cfg,
                               border_map=border_map))(bboxes)
    sel, ok_cl = _cluster_select_batch(pts_v, pts_w, cells_v, m2,
                                       center_w, cam, cfg)

    def post(pts_w_i, sel_i, battr_i, bbox, run, sym_type, okp, okc, okcl):
        Two, pts_n, obj_m, sym_src = _stage_post_one(
            pts_w_i, sel_i, battr_i, pose_wc, ground_plane, cam, cfg)
        valid = okp & okc & okcl
        return _sym_finish_one(
            Two, pts_n, obj_m, sym_src, valid & run, bbox, sym_type,
            pose_wc, proj_depth, cam, cfg, need_single, need_dual)

    e_local, prob, ok, pts_n, obj_m, Two = jax.vmap(post)(
        pts_w, sel, battr_v, bboxes, run_mask, sym_types, ok_p, ok_c,
        ok_cl)
    return e_local, prob, ok, (pts_n, obj_m, Two)


def _sym_finish_one(Two, pts_n, obj_m, sym_src, ok_in, bbox, sym_type,
                    pose_wc, proj_depth, cam: Camera, cfg: ExtractorConfig,
                    need_single: bool, need_dual: bool, proj_row0=0,
                    proj_hw=None):
    """Stages (g)-(h) of one detection: optional symmetry completion,
    scale from normalized stats, camera-local assembly + validity.

    ``proj_row0``/``proj_hw``: multi-frame batches pass proj_depth as
    one stacked [B*H, W] map with per-detection row offsets (see
    ops/backproject.bbox_point_cloud)."""
    prob = jnp.float32(1.0)
    if cfg.open_symmetry and (need_single or need_dual):
        from . import symmetry as sym_mod
        sym_cfg = sym_mod.SymmetryConfig(
            analytic_grad=cfg.sym_analytic_grad)
        pose_oc = se3.se3_mul(se3.se3_inv(Two), pose_wc)
        variants = []
        if need_single:
            res_s = sym_mod.estimate_symmetry(pts_n, obj_m, bbox,
                                              pose_oc, proj_depth, cam,
                                              dual=False, cfg=sym_cfg,
                                              src_mask=sym_src,
                                              row0=proj_row0, hw=proj_hw)
            variants.append(("s", res_s, sym_mod.complete_cloud(
                pts_n, obj_m, res_s, dual=False)))
        if need_dual:
            res_d = sym_mod.estimate_symmetry(pts_n, obj_m, bbox,
                                              pose_oc, proj_depth, cam,
                                              dual=True, cfg=sym_cfg,
                                              src_mask=sym_src,
                                              row0=proj_row0, hw=proj_hw)
            variants.append(("d", res_d, sym_mod.complete_cloud(
                pts_n, obj_m, res_d, dual=True)))

        use_sym = sym_type > 0
        if len(variants) == 2:
            use_dual = sym_type == 2
            (_, res_s, (pts_s, m_s, Tom_s)) = variants[0]
            (_, res_d, (pts_d, m_d, Tom_d)) = variants[1]
            pts_sym = jnp.where(use_dual, pts_d, pts_s)
            m_sym = jnp.where(use_dual, m_d, m_s)
            Tom = jnp.where(use_dual, Tom_d, Tom_s)
            sym_prob = jnp.where(use_dual, res_d.prob, res_s.prob)
        else:
            (_, res_v, (pts_sym, m_sym, Tom)) = variants[0]
            sym_prob = res_v.prob

        # no-symmetry fallback padded to the same 4S capacity
        S = pts_n.shape[0]
        pts_plain = jnp.concatenate([pts_n, jnp.zeros((3 * S, 3))])
        m_plain = jnp.concatenate([obj_m, jnp.zeros(3 * S, bool)])

        pts_fin = jnp.where(use_sym, pts_sym, pts_plain)
        m_fin = jnp.where(use_sym, m_sym, m_plain)
        Two_fin = jnp.where(use_sym, se3.se3_mul(Two, Tom), Two)
        prob = jnp.where(use_sym, sym_prob, 1.0)
    else:
        pts_fin, m_fin, Two_fin = pts_n, obj_m, Two

    e_local, e_world = _finish_one(Two_fin, pts_fin, m_fin, pose_wc)
    ok = ok_in & jnp.all(jnp.isfinite(e_local)) & (prob > 1e-8)
    return e_local, prob, ok, pts_fin, m_fin, Two_fin


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "need_single",
                                   "need_dual"))
def _extract_packed(depth_u16, flat, cam, cfg, pad, need_single, need_dual):
    """One-upload / one-program frame extraction.

    ``flat`` packs [bboxes(pad,4) | run(pad) | sym_type(pad) | pose_wc(7)
    | ground_plane(4)] as a single f32 vector so the host issues exactly
    two transfers per frame (depth + args) and one program; the [pad, 12]
    (vec10, prob, valid) output packing lives inside the jit too (an
    eager concatenate would be an extra dispatched program per frame).
    """
    bb = flat[:pad * 4].reshape(pad, 4)
    run = flat[pad * 4:pad * 5] > 0.5
    st = flat[pad * 5:pad * 6].astype(jnp.int32)
    pose_wc = flat[pad * 6:pad * 6 + 7]
    ground_plane = flat[pad * 6 + 7:pad * 6 + 11]
    e, p, v, _ = extract_local_ellipsoids(
        depth_u16, bb, run, pose_wc, ground_plane, cam, cfg,
        sym_types=st, need_single=need_single, need_dual=need_dual)
    return jnp.concatenate([e, p[:, None], v[:, None].astype(e.dtype)],
                           axis=1)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad"))
def _extract_phase_a(depth_u16, flat, cam, cfg, pad):
    """Phase A of the host-clustered split extraction: stages (a)-(c) for
    all detections, packed into ONE [pad, row] array for a single async
    host copy.  Row layout: [pts_w(cap*3) | m2(cap) | battr(cap, sparse
    mode only) | center_w(3), ok_points, ok_center].
    """
    depth = depth_u16.astype(jnp.int32)
    bb = flat[:pad * 4].reshape(pad, 4).astype(jnp.float32)
    pose_wc = flat[pad * 6:pad * 6 + 7]
    ground_plane = flat[pad * 6 + 7:pad * 6 + 11]
    border_map = None
    if cfg.open_symmetry and cfg.sparse_symmetry:
        from ..ops import filters
        border_map = filters.depth_border_mask(depth, cam.scale)

    def one(bbox):
        (_, pts_w, _, m2, center_w, okp, okc, battr_v) = _stage_a_one(
            depth, bbox, pose_wc, ground_plane, cam, cfg,
            border_map=border_map)
        parts = [pts_w.reshape(-1), m2.astype(jnp.float32)]
        if battr_v is not None:
            parts.append(battr_v)
        parts.append(jnp.concatenate(
            [center_w, okp.astype(jnp.float32)[None],
             okc.astype(jnp.float32)[None]]))
        return jnp.concatenate(parts)

    return jax.vmap(one)(bb)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "need_single",
                                   "need_dual"))
def _extract_phase_b(depth_u16, flat, a_out, sel_flat, cam, cfg, pad,
                     need_single, need_dual):
    """Phase B: stages (e)-(h) + symmetry from the host-selected cluster.

    ``a_out`` is phase A's DEVICE output (no re-upload — the world cloud
    is sliced out of it); ``sel_flat`` is the host-computed cluster
    selection mask; ``flat``'s run lane carries the final per-detection
    validity (points/center/cluster gates folded in by the host).
    """
    depth = depth_u16.astype(jnp.int32)
    bb = flat[:pad * 4].reshape(pad, 4).astype(jnp.float32)
    run = flat[pad * 4:pad * 5] > 0.5
    st = flat[pad * 5:pad * 6].astype(jnp.int32)
    pose_wc = flat[pad * 6:pad * 6 + 7]
    ground_plane = flat[pad * 6 + 7:pad * 6 + 11]
    cap = cfg.cloud_capacity
    sparse = cfg.open_symmetry and cfg.sparse_symmetry
    proj_depth = (bp.proj_depth_map(depth, cam) if cfg.open_symmetry
                  else None)
    sel = sel_flat.reshape(pad, cap) > 0.5

    def one(bbox, run_i, sym_type, row, sel_i):
        pts_w = row[:cap * 3].reshape(cap, 3)
        battr_v = row[cap * 4:cap * 5] if sparse else None
        Two, pts_n, obj_m, sym_src = _stage_post_one(
            pts_w, sel_i, battr_v, pose_wc, ground_plane, cam, cfg)
        return _sym_finish_one(Two, pts_n, obj_m, sym_src, run_i, bbox,
                               sym_type, pose_wc, proj_depth, cam, cfg,
                               need_single, need_dual)

    e, p, ok, _, _, _ = jax.vmap(one)(bb, run, st, a_out, sel)
    return jnp.concatenate([e, p[:, None], ok[:, None].astype(e.dtype)],
                           axis=1)


def _select_cluster_np(pts_w, mask, labels, center, min_size, center_dis):
    """Host mirror of ops.cluster.select_cluster (same semantics,
    EllipsoidExtractor.cpp:675-736). Returns (sel mask, ok)."""
    import numpy as np
    N = len(pts_w)
    valid = mask & (labels < N)
    lab = labels[valid]
    sizes = np.zeros(N, np.float32)
    np.add.at(sizes, lab, 1.0)
    d = np.linalg.norm(pts_w - center, axis=1)
    min_d = np.full(N, np.inf, np.float32)
    np.minimum.at(min_d, lab, d[valid].astype(np.float32))

    is_cluster = sizes >= min_size
    n_clusters = int(is_cluster.sum())
    near = is_cluster & (min_d < center_dis)
    size_key = np.where(near, sizes, -1.0)
    best_near = int(np.argmax(size_key))
    size_key_all = np.where(is_cluster, sizes, -1.0)
    best_any = int(np.argmax(size_key_all))

    use_fallback = (n_clusters == 1) and (near.sum() == 0)
    chosen = best_any if use_fallback else best_near
    ok = bool(near.sum() > 0 or use_fallback)
    sel = valid & (labels == chosen) & ok
    return sel, ok


class _PhaseAHandle:
    """Pending split extraction: phase A dispatched, B not yet."""
    is_phase_a = True
    __slots__ = ("a_out", "depth_j", "flat", "pad", "cfg", "need_s",
                 "need_d", "run", "n")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _pack_frame(cam: Camera, cfg: ExtractorConfig, depth_u16, bboxes,
                labels, pose_wc, ground_plane):
    """Host packing shared by the split/fused extractors: detection
    padding, symmetry types, the single flat f32 arg vector and the
    cloud-capacity tier.  Returns a _PhaseAHandle with ``a_out=None``
    (the caller decides how to dispatch phase A)."""
    if ground_plane is None:
        return None
    import numpy as np
    from .symmetry import sym_type_of_labels
    D = len(bboxes)
    n = min(D, 32)
    if D > 32:
        import logging
        logging.getLogger("object_oriented_slam_tpu").warning(
            "frame has %d detections; only the first 32 get 3D "
            "extraction (the rest fall back to 2D-only)", D)
    pad = 1
    while pad < n:
        pad *= 2
    st = sym_type_of_labels(labels[:n]).astype(np.int64)
    flat = np.zeros(pad * 6 + 11, np.float32)
    if n:
        flat[:n * 4] = np.asarray(bboxes[:n], np.float32).ravel()
    flat[pad * 4:pad * 4 + n] = 1.0
    flat[pad * 5:pad * 5 + n] = st
    flat[pad * 6:pad * 6 + 7] = pose_wc
    flat[pad * 6 + 7:] = ground_plane
    tier = _cloud_tier(bboxes[:n], flat[pad * 4:pad * 4 + n] > 0,
                       cam.height, cam.width, cfg.cloud_capacity)
    cfg_t = (cfg if tier == cfg.cloud_capacity
             else dataclasses.replace(cfg, cloud_capacity=tier))
    return _PhaseAHandle(a_out=None, depth_j=jnp.asarray(depth_u16),
                         flat=flat, pad=pad, cfg=cfg_t,
                         need_s=bool((st == 1).any()),
                         need_d=bool((st == 2).any()),
                         run=flat[pad * 4:pad * 5] > 0.5, n=n)


class SplitExtractor:
    """Two-phase extractor: device stages (a)-(c), host grid-hash
    union-find clustering (native/src/cluster.cpp), device stages
    (e)-(h)+symmetry.

    The O(N^2) on-device min-label clustering was the frame loop's
    dominant device cost (~5-6 ms of the ~10 ms extraction program,
    BENCH_DETAILS.md); the host union-find is O(N) and runs during the
    pipeline's deferral window, so the device only executes the two
    cheap phases.  ``Tracking`` calls ``midway`` on the handle
    pipeline_depth//2 frames after dispatch (phase A's async copy has
    landed by then) and reads phase B's result pipeline_depth-1 frames
    after that.
    """
    two_phase = True

    def __init__(self, cam: Camera, cfg: ExtractorConfig):
        self.cam = cam
        self.cfg = cfg

    def __call__(self, depth_u16, bboxes, labels, pose_wc, ground_plane):
        h = _pack_frame(self.cam, self.cfg, depth_u16, bboxes, labels,
                        pose_wc, ground_plane)
        if h is None:
            return None
        h.a_out = _extract_phase_a(h.depth_j, jnp.asarray(h.flat),
                                   self.cam, h.cfg, h.pad)
        if hasattr(h.a_out, "copy_to_host_async"):
            try:
                h.a_out.copy_to_host_async()
            except Exception:
                pass
        return h

    def midway(self, h: _PhaseAHandle):
        """Fetch phase A, cluster+select on the host, dispatch phase B."""
        flat_b, sel_flat = _host_cluster_select(h)
        return _extract_phase_b(
            h.depth_j, jnp.asarray(flat_b), h.a_out,
            jnp.asarray(sel_flat.reshape(-1)), self.cam, h.cfg, h.pad,
            h.need_s, h.need_d)


def _host_cluster_select(hp: _PhaseAHandle):
    """Fetch phase A's output and run the host middle stage: native
    grid-hash union-find labels + reference cluster selection per
    detection.  Returns (flat_b with the final validity folded into the
    run lane, sel_flat [pad, cap])."""
    import numpy as np
    from ..io.native_loader import cluster_labels
    cfg = hp.cfg
    cap = cfg.cloud_capacity
    sparse = cfg.open_symmetry and cfg.sparse_symmetry
    a_np = np.asarray(hp.a_out)
    sel_flat = np.zeros((hp.pad, cap), np.float32)
    flat_b = hp.flat.copy()
    for i in range(hp.pad):
        if not hp.run[i]:
            flat_b[hp.pad * 4 + i] = 0.0
            continue
        row = a_np[i]
        pts_w = row[:cap * 3].reshape(cap, 3)
        m2 = row[cap * 3:cap * 4] > 0.5
        tail = row[cap * (5 if sparse else 4):]
        center_w, okp, okc = tail[:3], tail[3] > 0.5, tail[4] > 0.5
        labels = cluster_labels(pts_w, m2, cfg.cluster_tolerance)
        if labels is None:   # native lib unavailable: degenerate sel
            raise RuntimeError(
                "native cluster library unavailable; use "
                "make_extractor (monolithic) instead")
        sel, okcl = _select_cluster_np(
            pts_w, m2, labels, center_w, cfg.cluster_min_size,
            cfg.cluster_center_dis)
        sel_flat[i] = sel
        flat_b[hp.pad * 4 + i] = float(okp and okc and okcl)
    return flat_b, sel_flat


def make_split_extractor(cam: Camera, cfg: ExtractorConfig):
    """Split extractor when the native cluster library is available,
    else the monolithic single-program extractor."""
    from ..io.native_loader import native_available
    if native_available():
        return SplitExtractor(cam, cfg)
    return make_extractor(cam, cfg)


@partial(jax.jit, static_argnames=("cam", "cfg_cur", "cfg_prev", "pad_cur",
                                   "pad_prev", "need_single", "need_dual"))
def _extract_fused(depth_cur, flatA_cur, depth_prev, flatB_prev, abuf_prev,
                   sel_prev, cam, cfg_cur, cfg_prev, pad_cur, pad_prev,
                   need_single, need_dual):
    """ONE device program per frame for the host-clustered pipeline:
    phase A of the current frame + phase B of the previously dispatched
    frame (whose cluster the host selected in between).  Keeps the
    per-frame program count identical to the monolithic extractor — on
    the tunneled device the per-program overhead (5-30 ms by hour) costs
    more than the clustering it replaces, so the two-program split is a
    loss end-to-end while this fusion keeps the saving."""
    a_out = _extract_phase_a(depth_cur, flatA_cur, cam, cfg_cur, pad_cur)
    b_out = _extract_phase_b(depth_prev, flatB_prev, abuf_prev, sel_prev,
                             cam, cfg_prev, pad_prev, need_single,
                             need_dual)
    return a_out, b_out


class FusedSplitExtractor:
    """Host-clustered extraction at one device program per frame.

    Per ``step`` call: the oldest pending frame's phase-A output (async
    copy started at its dispatch, >= 1 frame period ago) is fetched,
    clustered by the native union-find and cluster-selected on the host;
    its phase B is then dispatched FUSED with the new frame's phase A.
    Results therefore arrive tagged for an earlier frame —
    ``system.Tracking`` keeps a frame-id -> result map and its existing
    deferral pipeline absorbs the extra frame of latency.
    """
    fused = True
    # Tracking's fuse_lm deferral requires this; the deferred batch is
    # consumed by step_with_lm (one fused program) when a due phase-B
    # partner exists, else dispatched standalone by the caller.
    supports_lm_fusion = True

    # consume pending phase-A handles this many steps behind dispatch:
    # lag 1 blocks on a fetch whose program just entered the device queue
    # (a fresh blocking fetch costs a full tunnel round trip, 25-100 ms);
    # lag 2 gives the async copy a full frame period to land
    chain_lag = 2

    def __init__(self, cam: Camera, cfg: ExtractorConfig):
        self.cam = cam
        self.cfg = cfg
        from collections import deque
        self._chain = deque()      # pending (frame_id, _PhaseAHandle)
        # monotone cloud-capacity tier: _extract_fused is jit-static over
        # BOTH frames' (cfg, pad), so free per-frame tiering would compile
        # up to tiers^2 adjacent-pair variants (2-60 s each on the
        # tunneled remote service).  Growing-only tiers bound that to one
        # mixed pair per growth step, like the backend's tier policy.
        self._tier = 0

    def step(self, frame_id, depth_u16, bboxes, labels, pose_wc,
             ground_plane):
        """Dispatch the frame; returns (ran, [(frame_id, b_out), ...])."""
        h = _pack_frame(self.cam, self.cfg, depth_u16, bboxes, labels,
                        pose_wc, ground_plane)
        if h is None:
            return False, []
        self._tier = max(self._tier, h.cfg.cloud_capacity)
        if h.cfg.cloud_capacity != self._tier:
            h.cfg = dataclasses.replace(h.cfg, cloud_capacity=self._tier)
        results = []
        if len(self._chain) >= self.chain_lag:
            fid_prev, hp = self._chain.popleft()
            flat_b, sel_flat = _host_cluster_select(hp)
            h.a_out, b_out = _extract_fused(
                h.depth_j, jnp.asarray(h.flat), hp.depth_j,
                jnp.asarray(flat_b), hp.a_out,
                jnp.asarray(sel_flat.reshape(-1)), self.cam, h.cfg,
                hp.cfg, h.pad, hp.pad, hp.need_s, hp.need_d)
            results.append((fid_prev, b_out))
        else:
            h.a_out = _extract_phase_a(h.depth_j, jnp.asarray(h.flat),
                                       self.cam, h.cfg, h.pad)
        if hasattr(h.a_out, "copy_to_host_async"):
            try:
                h.a_out.copy_to_host_async()
            except Exception:
                pass
        self._chain.append((frame_id, h))
        return True, results

    def step_with_lm(self, frame_id, depth_u16, bboxes, labels, pose_wc,
                     ground_plane, lm_args):
        """``step`` with the due backend LM riding the fused program.

        Returns (ran, results, est, chi2); est/chi2 are None when the LM
        could not be fused this frame (no due phase-B partner yet) — the
        caller then dispatches the prepared batch standalone.
        """
        h = _pack_frame(self.cam, self.cfg, depth_u16, bboxes, labels,
                        pose_wc, ground_plane)
        if h is None:
            return False, [], None, None
        self._tier = max(self._tier, h.cfg.cloud_capacity)
        if h.cfg.cloud_capacity != self._tier:
            h.cfg = dataclasses.replace(h.cfg, cloud_capacity=self._tier)
        results = []
        est = chi2 = None
        if len(self._chain) >= self.chain_lag:
            fid_prev, hp = self._chain.popleft()
            flat_b, sel_flat = _host_cluster_select(hp)
            lm_flat, est_prev, K, normal, gset, layout, lm_cfg = lm_args
            h.a_out, b_out, est, chi2 = _extract_fused_lm(
                h.depth_j, jnp.asarray(h.flat), hp.depth_j,
                jnp.asarray(flat_b), hp.a_out,
                jnp.asarray(sel_flat.reshape(-1)), lm_flat, est_prev, K,
                normal, gset, self.cam, h.cfg, hp.cfg, h.pad, hp.pad,
                hp.need_s, hp.need_d, layout, lm_cfg)
            results.append((fid_prev, b_out))
        else:
            h.a_out = _extract_phase_a(h.depth_j, jnp.asarray(h.flat),
                                       self.cam, h.cfg, h.pad)
        if hasattr(h.a_out, "copy_to_host_async"):
            try:
                h.a_out.copy_to_host_async()
            except Exception:
                pass
        self._chain.append((frame_id, h))
        return True, results, est, chi2

    def _phase_b_standalone(self, fid, hp):
        flat_b, sel_flat = _host_cluster_select(hp)
        b_out = _extract_phase_b(
            hp.depth_j, jnp.asarray(flat_b), hp.a_out,
            jnp.asarray(sel_flat.reshape(-1)), self.cam, hp.cfg,
            hp.pad, hp.need_s, hp.need_d)
        return fid, b_out

    def drain(self, current_frame_id):
        """Consume pending handles >= chain_lag frames old without a new
        dispatch.  Tracking calls this on frames that dispatch no
        extraction (no runnable detections), so due handles — whose
        phase-A async copy has long landed — don't pile up until a
        sync-time ``flush`` that would also standalone-run the youngest
        handle and block on a fresh tunnel fetch (25-100 ms).
        """
        out = []
        while (self._chain and current_frame_id - self._chain[0][0]
               >= self.chain_lag):
            out.append(self._phase_b_standalone(*self._chain.popleft()))
        return out

    def flush(self):
        """Run standalone phase B for every pending frame (tail/sync)."""
        out = []
        while self._chain:
            out.append(self._phase_b_standalone(*self._chain.popleft()))
        return out


def make_fused_extractor(cam: Camera, cfg: ExtractorConfig):
    """Fused host-clustered extractor when the native library is
    available, else the monolithic single-program extractor."""
    from ..io.native_loader import native_available
    if native_available():
        return FusedSplitExtractor(cam, cfg)
    return make_extractor(cam, cfg)


def _cloud_tier(bboxes, run, rows, cols, cap_max):
    """Power-of-two cloud capacity covering the frame's largest bbox.

    The post-voxel cloud of a detection can never exceed its strided
    pixel count, so a capacity >= that bound yields BIT-IDENTICAL
    results to the full capacity (padding only) while the O(N^2)
    clustering pass shrinks quadratically for small objects.
    """
    import numpy as np
    n_max = 1
    for i in range(len(bboxes)):
        if not run[i]:
            continue
        x1 = max(0.0, min(float(bboxes[i][0]), cols - 1))
        y1 = max(0.0, min(float(bboxes[i][1]), rows - 1))
        x2 = max(0.0, min(float(bboxes[i][2]), cols))
        y2 = max(0.0, min(float(bboxes[i][3]), rows))
        npix = (int(max(0.0, x2 - x1)) // bp.STRIDE + 1) * \
               (int(max(0.0, y2 - y1)) // bp.STRIDE + 1)
        n_max = max(n_max, npix)
    cap = 1024
    while cap < min(n_max, cap_max):
        cap *= 2
    return min(cap, cap_max)


def _lm_from_flat(lm_flat, est_prev, K, normal, gset, layout, lm_cfg):
    """Unpack the flat LM batch (same as tracking._get_unpack) and run
    the global-BA LM; traced inside the fused extraction programs."""
    from ..backend import ObjectObservations, optimize_objects_soa
    out = {}
    for name, offi, shp in layout:
        size = 1
        for s in shp:
            size *= s
        out[name] = jax.lax.dynamic_slice(
            lm_flat, (offi,), (size,)).reshape(shp)
    est0 = jnp.where(out["useprev"][:, None] > 0.5, est_prev, out["est0"])
    obs = ObjectObservations(
        est0=est0, obj_mask=out["objmask"] > 0.5,
        pose2d_cw=out["p2"], bbox2d=out["b2"], prob2d=out["pr2"],
        mask2d=out["m2"] > 0.5,
        pose3d_wc=out["p3"], meas3d=out["me3"], prob3d=out["pr3"],
        mask3d=out["m3"] > 0.5)
    return optimize_objects_soa(obs, K, normal, gset, lm_cfg)


@partial(jax.jit, static_argnames=("cam", "cfg", "pad", "need_single",
                                   "need_dual", "layout", "lm_cfg"))
def _combined_ext_lm(depth_u16, flat, lm_flat, est_prev, K, normal, gset,
                     cam, cfg, pad, need_single, need_dual, layout,
                     lm_cfg):
    """Extraction of frame t + the due global-BA LM of frame t-d as ONE
    device program — on the tunneled device each program costs a large
    hour-dependent fixed overhead (5-30 ms measured), so per-frame
    program count is the dominant end-to-end knob.  ``layout`` is the
    packed observation-batch layout (tuples of (name, offset, shape))
    from system.tracking's backend packer."""
    ext = _extract_packed(depth_u16, flat, cam, cfg, pad, need_single,
                          need_dual)
    est, chi2 = _lm_from_flat(lm_flat, est_prev, K, normal, gset, layout,
                              lm_cfg)
    return ext, est, chi2


@partial(jax.jit, static_argnames=("cam", "cfg_cur", "cfg_prev", "pad_cur",
                                   "pad_prev", "need_single", "need_dual",
                                   "layout", "lm_cfg"))
def _extract_fused_lm(depth_cur, flatA_cur, depth_prev, flatB_prev,
                      abuf_prev, sel_prev, lm_flat, est_prev, K, normal,
                      gset, cam, cfg_cur, cfg_prev, pad_cur, pad_prev,
                      need_single, need_dual, layout, lm_cfg):
    """The full low-latency-link production program: phase A of frame t
    + phase B of frame t-chain_lag (host-clustered in between) + the due
    global-BA LM, all as ONE device program — the 'fused-split + LM
    fusion' configuration of the round-2 dispatch-architecture A/B."""
    a_out = _extract_phase_a(depth_cur, flatA_cur, cam, cfg_cur, pad_cur)
    b_out = _extract_phase_b(depth_prev, flatB_prev, abuf_prev, sel_prev,
                             cam, cfg_prev, pad_prev, need_single,
                             need_dual)
    est, chi2 = _lm_from_flat(lm_flat, est_prev, K, normal, gset, layout,
                              lm_cfg)
    return a_out, b_out, est, chi2


class MonolithicExtractor:
    """Single-program frame extraction (the production default).

    Returns a DEVICE array packed [pad, 12] (vec10, prob, valid) so the
    caller can fold it into one host fetch per frame — each fetch costs a
    full tunnel round trip (~25 ms on the remote axon device), so the
    3-array protocol cost more than the extraction itself.

    The detection axis is padded to the next power of two: the extraction
    work is linear in the padded count, and most frames carry few
    detections (the bundled cabinet sequence has exactly 1), so compiling
    a handful of shape variants buys back device time on sparse frames.
    Detections beyond the 32-slot safety cap fall back to 2D-only
    observations (tracking masks them invalid).

    ``dispatch_with_lm`` additionally folds the due backend LM call into
    the same device program (see _combined_ext_lm).
    """
    supports_lm_fusion = True

    def __init__(self, cam: Camera, cfg: ExtractorConfig):
        self.cam = cam
        self.cfg = cfg

    def __call__(self, depth_u16, bboxes, labels, pose_wc, ground_plane):
        h = _pack_frame(self.cam, self.cfg, depth_u16, bboxes, labels,
                        pose_wc, ground_plane)
        if h is None:
            return None
        # depth ships in its native dtype (u16 halves the upload; the jit
        # casts to int32 on device)
        return _extract_packed(h.depth_j, jnp.asarray(h.flat), self.cam,
                               h.cfg, h.pad, h.need_s, h.need_d)

    def dispatch_with_lm(self, depth_u16, bboxes, labels, pose_wc,
                         ground_plane, lm_args):
        """One program: this frame's extraction + the prepared LM batch.

        lm_args = (lm_flat, est_prev, K, normal, gset, layout, lm_cfg).
        Returns (ext_out, est, chi2) or None when extraction can't run
        (the caller then dispatches the LM standalone)."""
        h = _pack_frame(self.cam, self.cfg, depth_u16, bboxes, labels,
                        pose_wc, ground_plane)
        if h is None:
            return None
        lm_flat, est_prev, K, normal, gset, layout, lm_cfg = lm_args
        return _combined_ext_lm(h.depth_j, jnp.asarray(h.flat), lm_flat,
                                est_prev, K, normal, gset, self.cam,
                                h.cfg, h.pad, h.need_s, h.need_d, layout,
                                lm_cfg)


def make_extractor(cam: Camera, cfg: ExtractorConfig):
    """Adapter for system.Tracking's extractor hook (monolithic)."""
    return MonolithicExtractor(cam, cfg)
