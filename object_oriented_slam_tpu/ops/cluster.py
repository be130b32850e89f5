"""Euclidean clustering (connected components of the radius graph).

Replaces PCL ``EuclideanClusterExtraction`` + KdTree
(src/pca/EllipsoidExtractor.cpp:646-737): points closer than ``tolerance``
are connected; connected components are clusters; clusters smaller than
``min_size`` are dropped; the selected cluster is the largest one whose
minimum distance to the 2D-center-estimate is below ``center_dis``
(PCL returns clusters sorted by size descending; single-cluster frames are
accepted unconditionally, EllipsoidExtractor.cpp:696-714).

TPU-shaped algorithm: iterative minimum-label propagation over the radius
graph, interleaved with pointer-jumping to collapse long chains in
O(log N) extra steps.  Two neighbor-generation backends:

* ``connected_components_grid`` (the production extractor path): after a
  voxel downsample at ``leaf`` every point occupies a unique grid cell,
  so all radius-``tol`` neighbors live in the (2R+1)^3 surrounding cells
  (R = ceil(tol/leaf)) and each of those cells holds at most ONE point.
  Sorting by packed cell key and binary-searching the <= 124 candidate
  cell keys yields an EXACT fixed-capacity neighbor table [N, C] built
  once; each propagation round is then a single [N, C] gather + min —
  O(N * C) instead of the O(N^2) distance pass (40x fewer candidate
  pairs at N=8192, C=124).  The radius test is the same f32
  sum((p-q)^2) <= tol^2 as the exact dense pass.
* ``connected_components`` (general clouds, no voxel precondition):
  blocked [B, N] distance passes so the N x N matrix is never
  materialized.  The default pass computes the pairwise cross term as a
  [B,3]x[3,N] matmul (MXU) with the norm expansion
  d2 = |x|^2 + |y|^2 - 2 x.y on centroid-shifted coordinates; centering
  bounds the f32 cancellation error of the expansion to ~1e-8 m^2 on
  meter-scale clouds (a +-3e-5 m perturbation of the 2 cm radius --
  far below depth-sensor noise; measured 3x faster than the exact
  broadcast form on TPU v5e).  ``exact=True`` selects the direct
  (x-y)^2 broadcast pass (bit-faithful radius test on f32 inputs).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BLOCK = 2048  # pass-block rows.  512 -> 2048 measured 13 % faster on
#                the v5e at the 16384-lane worst case (51.3 vs 59.0 ms,
#                labels bit-identical; 4096 is equal to 2048) — fewer
#                scan steps amortize the per-step op latency.  Blocks
#                clamp to the cloud size, so small test clouds and the
#                CPU mesh see one block either way.  Pass functions take
#                an optional ``block`` override so finer compaction
#                rungs (1024-aligned caps like 5120/7168) stay
#                pad-free; labels are tiling-invariant.


def _min_label_pass(pts, mask, labels, tol2, block=None):
    """One exact pass: label_i <- min over neighbors j of label_j."""
    N = pts.shape[0]
    _B = block or _BLOCK
    n_blocks = (N + _B - 1) // _B
    pts_pad = jnp.pad(pts, ((0, n_blocks * _B - N), (0, 0)))
    mask_pad = jnp.pad(mask, (0, n_blocks * _B - N))

    def body(carry, b):
        block_pts = jax.lax.dynamic_slice(pts_pad, (b * _B, 0),
                                          (_B, 3))
        block_mask = jax.lax.dynamic_slice(mask_pad, (b * _B,), (_B,))
        # [B, N] squared distances
        d2 = jnp.sum((block_pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        adj = (d2 <= tol2) & block_mask[:, None] & mask[None, :]
        neigh = jnp.where(adj, labels[None, :], jnp.int32(2 ** 30))
        new_block = jnp.min(neigh, axis=1)
        return carry, new_block

    _, blocks = jax.lax.scan(body, None, jnp.arange(n_blocks))
    new_labels = blocks.reshape(-1)[:N]
    return jnp.where(mask, jnp.minimum(labels, new_labels), labels)


def _min_label_pass_mm(pts, nrm, mask, labels, tol2, block=None):
    """One MXU pass over pre-centered points with precomputed |x|^2."""
    N = pts.shape[0]
    _B = block or _BLOCK
    n_blocks = (N + _B - 1) // _B
    pts_pad = jnp.pad(pts, ((0, n_blocks * _B - N), (0, 0)))
    nrm_pad = jnp.pad(nrm, (0, n_blocks * _B - N))
    mask_pad = jnp.pad(mask, (0, n_blocks * _B - N))

    def body(carry, b):
        block_pts = jax.lax.dynamic_slice(pts_pad, (b * _B, 0),
                                          (_B, 3))
        block_nrm = jax.lax.dynamic_slice(nrm_pad, (b * _B,), (_B,))
        block_mask = jax.lax.dynamic_slice(mask_pad, (b * _B,), (_B,))
        cross = jax.lax.dot_general(block_pts, pts, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        d2 = block_nrm[:, None] + nrm[None, :] - 2.0 * cross
        adj = (d2 <= tol2) & block_mask[:, None] & mask[None, :]
        neigh = jnp.where(adj, labels[None, :], jnp.int32(2 ** 30))
        return carry, jnp.min(neigh, axis=1)

    _, blocks = jax.lax.scan(body, None, jnp.arange(n_blocks))
    new_labels = blocks.reshape(-1)[:N]
    return jnp.where(mask, jnp.minimum(labels, new_labels), labels)


_CHAIN_PERMS = ((0, 1, 2), (1, 2, 0), (2, 0, 1))


def _chain_structs(pts, mask, tol2, n_orders):
    """Precompute ``n_orders`` spatial chain structures (order, inv,
    linked) reused by every chain pass.

    Each order sorts by a Morton-ish voxel key with a different axis
    permutation (different orders break a component's zigzag chains at
    different places, so their union propagates much further).  Points
    never move during clustering, so the O(N log N) argsorts happen ONCE
    per call; a chain pass is then one gather + two segmented scans +
    one gather — ~10x cheaper than a dense [B, N] distance pass.

    Caveat (shared with the module-level norm-expansion note): links use
    the exact f32 ``d2 <= tol2`` test on uncentered points, while the
    dense pass uses the centered norm-expansion d2 with ~1e-8 m^2
    cancellation error — for pairs within that sub-noise band of the
    radius boundary, chain passes can converge to a different (still
    valid) component split than chains=0, so bit-identical-to-dense
    claims hold only away from that boundary.

    ``n_orders`` is clamped to the distinct axis permutations available
    (len(_CHAIN_PERMS)): extra passes would reuse an identical order and
    pay argsorts/scans for zero additional propagation.
    """
    n_orders = min(n_orders, len(_CHAIN_PERMS))
    tol = jnp.sqrt(tol2)
    cell = jnp.floor(pts / tol).astype(jnp.int32)
    c = jnp.clip(cell + 512, 0, 1023)
    structs = []
    for k in range(n_orders):
        p = _CHAIN_PERMS[k]
        key = (c[:, p[0]] << 20) | (c[:, p[1]] << 10) | c[:, p[2]]
        key = jnp.where(mask, key, jnp.int32(2 ** 30))
        order = jnp.argsort(key)
        pts_s = pts[order]
        mask_s = mask[order]
        d2prev = jnp.sum((pts_s[1:] - pts_s[:-1]) ** 2, axis=-1)
        linked = jnp.concatenate(
            [jnp.array([False]),
             (d2prev <= tol2) & mask_s[1:] & mask_s[:-1]])
        structs.append((order, jnp.argsort(order), linked))
    return tuple(structs)


def _seg_min_combine(a, b):
    """Segmented-min combine over (value, is_boundary) pairs."""
    av, astart = a
    bv, bstart = b
    v = jnp.where(bstart, bv, jnp.minimum(av, bv))
    return v, astart | bstart


def _chain_apply(labels, struct):
    """One bidirectional min-label pass along a precomputed chain order.

    The links are a SUBSET of the true radius graph (consecutive-in-sort
    points that genuinely pass the f32 radius test), so chain passes
    never merge across true components — they only accelerate
    propagation inside them.  Labels are monotone non-increasing.
    (Borderline pairs within the dense pass's ~1e-8 m^2 norm-expansion
    error band can link here but not there, or vice versa — see
    _chain_structs.)
    """
    order, inv, linked = struct
    lab_s = labels[order]
    start = ~linked
    fwd, _ = jax.lax.associative_scan(_seg_min_combine, (lab_s, start),
                                      axis=0)
    linked_next = jnp.concatenate([linked[1:], jnp.array([False])])
    bwd, _ = jax.lax.associative_scan(_seg_min_combine,
                                      (lab_s, ~linked_next),
                                      axis=0, reverse=True)
    return jnp.minimum(fwd, bwd)[inv]


def _chain_seed(pts, mask, labels0, tol2, structs=None):
    """Cheap label seeding along spatial sort orders (see _chain_structs).

    Dense clouds start the exact min-label rounds mostly pre-merged,
    cutting global rounds; no [B, N] distance pass involved.
    """
    if structs is None:
        structs = _chain_structs(pts, mask, tol2, 1)
    for s in structs:
        labels0 = _chain_apply(labels0, s)
    # masked lanes are singleton runs (sentinel keys, never linked), so
    # their label N is already preserved; the where is belt-and-braces
    return jnp.where(mask, labels0, jnp.full_like(labels0, labels0.shape[0]))


def _propagate(pass_fn, labels0, N, outer_iters, jump_iters,
               chain_structs=()):
    """Min-label rounds + pointer jumping inside a converging while_loop.

    ``pass_fn(labels) -> labels`` performs one neighbor min-label pass;
    typical object clouds settle in a few rounds, while ``outer_iters``
    bounds pathological chain topologies.  ``chain_structs`` (from
    _chain_structs) interleaves cheap bidirectional chain passes after
    every dense pass — simulated on cabinet clouds to cut dense rounds
    from 7-15 to 4-7 (the propagation tail is fragment-chain diffusion,
    which spatial-run scans collapse in O(N log N)); on the tunneled
    v5e the per-pass scan cost cancels the saving, so the production
    config keeps it off (BENCH_DETAILS round 5).  Returns
    ``(labels, converged)``: converged is False when the bound truncated
    a still-changing propagation — callers MUST surface that (a
    truncated run silently yields fragment components; the round-3
    oracle sweep caught exactly this as 0.1-0.2 m center bias).
    """
    def jumps(labels):
        def jump(lab, _):
            safe = jnp.clip(lab, 0, N - 1)
            nxt = jnp.where(lab < N, lab[safe], lab)
            return nxt, None

        labels, _ = jax.lax.scan(jump, labels, None, length=jump_iters)
        return labels

    def round_fn(labels):
        labels = pass_fn(labels)
        # chain passes ride BEFORE the (single) pointer-jump block so the
        # interleave adds no second jump scan per round
        for s in chain_structs:
            labels = _chain_apply(labels, s)
        return jumps(labels)

    def cond(state):
        _, prev_changed, it = state
        return prev_changed & (it < outer_iters)

    def body(state):
        labels, _, it = state
        new = round_fn(labels)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, still_changing, _ = jax.lax.while_loop(
        cond, body, (round_fn(labels0), jnp.bool_(True), jnp.int32(1)))
    return labels, ~still_changing


def connected_components(pts: jnp.ndarray, mask: jnp.ndarray, tol: float,
                         outer_iters: int = 8, jump_iters: int = 12,
                         exact: bool = False, with_converged: bool = False,
                         chains: int = -1, block: int | None = None):
    """Labels [N]: each point's component id = min point index in component.

    Masked-out points get label N (out of range).  With
    ``with_converged=True`` additionally returns the convergence flag
    (see _propagate).  ``chains``: |chains| = number of precomputed
    spatial chain orders used for label seeding; chains > 0 ALSO
    interleaves chain passes between dense rounds (0 disables both).
    Default -1 = single-order seeding only: interleaving cuts dense
    rounds ~2x in simulation but measured net-negative on the tunneled
    v5e, where a chain pass costs about one dense pass (BENCH_DETAILS
    round 5); positive values are for low-op-latency devices.
    ``block`` overrides the distance-pass tile rows (labels are
    tiling-invariant; finer compaction rungs pass 1024).
    """
    N = pts.shape[0]
    tol2 = jnp.float32(tol * tol)
    idx = jnp.arange(N, dtype=jnp.int32)
    labels0 = jnp.where(mask, idx, jnp.int32(N))
    structs = _chain_structs(pts, mask, tol2, abs(chains)) if chains else ()
    if structs:
        labels0 = _chain_seed(pts, mask, labels0, tol2, structs)
    interleave = structs if chains > 0 else ()

    if not exact:
        # center once (labels are translation-invariant; see module docstring)
        c = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / \
            jnp.maximum(jnp.sum(mask), 1).astype(pts.dtype)
        pts_c = jnp.where(mask[:, None], pts - c, 0.0)
        nrm = jnp.sum(pts_c * pts_c, axis=-1)

    def pass_fn(labels):
        if exact:
            return _min_label_pass(pts, mask, labels, tol2, block=block)
        return _min_label_pass_mm(pts_c, nrm, mask, labels, tol2,
                                  block=block)

    labels, conv = _propagate(pass_fn, labels0, N, outer_iters, jump_iters,
                              interleave)
    return (labels, conv) if with_converged else labels


def _grid_offsets(tol: float, leaf: float):
    """Static packed-key deltas of the cells that can hold a radius-``tol``
    neighbor of a point in the center cell (R = ceil(tol/leaf) rings,
    pruned by the minimum cube-to-cube distance)."""
    R = math.ceil(tol / leaf - 1e-9)
    t2 = (tol / leaf) ** 2

    def m(d):
        return max(abs(d) - 1, 0)

    offs = []
    for dx in range(-R, R + 1):
        for dy in range(-R, R + 1):
            for dz in range(-R, R + 1):
                if dx == dy == dz == 0:
                    continue
                if m(dx) ** 2 + m(dy) ** 2 + m(dz) ** 2 <= t2:
                    offs.append((dx << 20) + (dy << 10) + dz)
    return R, offs


def grid_supported(tol: float, leaf: float, max_span: float) -> bool:
    """Static gate for the grid path: the candidate-cell stencil must stay
    small (R <= 2, i.e. <= 124 candidates) and the cloud's possible spatial
    span must fit the 10-bit-per-axis key packing."""
    R, offs = _grid_offsets(tol, leaf)
    return len(offs) <= 124 and max_span / leaf + 2 * R + 2 <= 1024


def connected_components_grid(pts: jnp.ndarray, cells: jnp.ndarray,
                              mask: jnp.ndarray, tol: float, leaf: float,
                              outer_iters: int = 8, jump_iters: int = 12,
                              with_converged: bool = False):
    """Grid-hash connected components for voxel-downsampled clouds.

    PRECONDITION: each unmasked point occupies a distinct ``cells`` row
    (guaranteed by ops.voxel.voxel_downsample_cells, whose centroids this
    clusters).  The neighbor table is exact — every candidate pair passes
    the same f32 sum((p-q)^2) <= tol^2 test as the dense exact pass — so
    the components equal ``connected_components(pts, mask, tol, exact=True)``.
    Replaces the PCL KdTree radius search of the reference
    (src/pca/EllipsoidExtractor.cpp:646-737) with the O(N*C) design of
    SURVEY.md §7.2.  ``cells`` must be computed from the SAME coordinates
    as ``pts`` (pass camera-frame points here even when selection happens
    in world frame: pairwise distances are rigid-invariant, the cell
    bound is not).
    """
    N = pts.shape[0]
    tol2 = jnp.float32(tol * tol)
    R, offs = _grid_offsets(tol, leaf)
    big = jnp.int32(2 ** 30)
    idx = jnp.arange(N, dtype=jnp.int32)

    cmin = jnp.min(jnp.where(mask[:, None], cells, big), axis=0)
    c = jnp.clip(cells - cmin + R, 0, 1023)
    # unmasked keys < 2^30; masked points get unique sentinels so the sort
    # keeps per-key uniqueness (spurious sentinel matches are harmless:
    # masked labels are pinned at N and never win a min)
    key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
    key = jnp.where(mask, key, big + idx)

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    mask_s = mask[order]

    dkeys = jnp.asarray(offs, jnp.int32)                    # [C]
    targets = key_s[:, None] + dkeys[None, :]               # [N, C]
    pos = jnp.searchsorted(key_s, targets, side="left",
                           method="scan_unrolled")
    pos = jnp.minimum(pos, N - 1).astype(jnp.int32)
    hit = (key_s[pos] == targets) & mask_s[:, None]
    d2 = jnp.sum((pts_s[:, None, :] - pts_s[pos]) ** 2, axis=-1)
    hit = hit & (d2 <= tol2)
    nbr_vals = jnp.where(hit, order[pos], order[:, None])   # original ids
    inv = jnp.argsort(order)
    nbr = nbr_vals[inv]                                     # original order

    labels0 = jnp.where(mask, idx, jnp.int32(N))
    labels0 = _chain_seed(pts, mask, labels0, tol2)

    def pass_fn(labels):
        return jnp.minimum(labels, jnp.min(labels[nbr], axis=1))

    labels, conv = _propagate(pass_fn, labels0, N, outer_iters, jump_iters)
    return (labels, conv) if with_converged else labels


def components_compacted(pts: jnp.ndarray, mask: jnp.ndarray, tol: float,
                         outer_iters: int, jump_iters: int,
                         compact_cap: int, with_converged: bool = False,
                         chains: int = -1, block: int | None = None):
    """Components with the unmasked points compacted into the front
    ``compact_cap`` lanes — PRECONDITION: sum(mask) <= compact_cap (the
    caller must guarantee it, e.g. with an outer lax.cond; overflowed
    points would silently be dropped otherwise).

    The supporting-plane filter typically discards ~half of the voxel
    cloud before clustering (cabinet frames: 13k voxels -> 6.6k
    survivors), but masked lanes still pay full price in every [B, N]
    distance pass; compacting (stable order, so min-index labels map
    back exactly) quarters the quadratic pass cost.
    """
    N = pts.shape[0]
    # stable: unmasked points keep their original relative order, so the
    # min compacted index maps to the min original index per component
    order = jnp.argsort(jnp.where(mask, 0, 1).astype(jnp.int32),
                        stable=True)
    sub = order[:compact_cap].astype(jnp.int32)
    lab_c, conv = connected_components(pts[sub], mask[sub], tol,
                                       outer_iters, jump_iters,
                                       with_converged=True, chains=chains,
                                       block=block)
    orig = jnp.where(lab_c < compact_cap,
                     sub[jnp.clip(lab_c, 0, compact_cap - 1)],
                     jnp.int32(N))
    labels = jnp.full((N,), N, jnp.int32).at[sub].set(orig)
    return (labels, conv) if with_converged else labels


def connected_components_compact(pts: jnp.ndarray, mask: jnp.ndarray,
                                 tol: float, outer_iters: int = 8,
                                 jump_iters: int = 12,
                                 compact_cap: int | None = None):
    """``components_compacted`` with a lax.cond fallback to the
    full-width pass when the survivors overflow ``compact_cap`` —
    results ALWAYS equal ``connected_components``.

    CAVEAT: under vmap the cond lowers to select and BOTH branches
    execute; batched callers should hoist the decision outside the vmap
    (frontend/extractor._cluster_select_batch does) and call
    ``components_compacted`` / ``connected_components`` directly.
    """
    N = pts.shape[0]
    if compact_cap is None or compact_cap >= N:
        return connected_components(pts, mask, tol, outer_iters,
                                    jump_iters)

    def compact_branch(_):
        return components_compacted(pts, mask, tol, outer_iters,
                                    jump_iters, compact_cap)

    def full_branch(_):
        return connected_components(pts, mask, tol, outer_iters,
                                    jump_iters)

    return jax.lax.cond(jnp.sum(mask) <= compact_cap, compact_branch,
                        full_branch, None)


def select_cluster(pts: jnp.ndarray, mask: jnp.ndarray, labels: jnp.ndarray,
                   center: jnp.ndarray, min_size: int, center_dis: float):
    """Reference cluster-selection semantics (EllipsoidExtractor.cpp:675-736).

    Returns (point_mask of the chosen cluster, ok scalar).
    """
    N = pts.shape[0]
    seg = jnp.where(mask, labels, N)
    sizes = jax.ops.segment_sum(jnp.ones(N, jnp.float32), seg,
                                num_segments=N + 1)[:N]
    # per-cluster min distance to the center estimate
    d = jnp.linalg.norm(pts - center, axis=1)
    d = jnp.where(mask, d, jnp.inf)
    min_d = jax.ops.segment_min(d, seg, num_segments=N + 1)[:N]

    is_cluster = sizes >= min_size          # root slots with enough points
    n_clusters = jnp.sum(is_cluster)
    near = is_cluster & (min_d < center_dis)

    # order by size desc: pick the largest "near" cluster (PCL sorts clusters
    # by size descending and the reference takes the first passing one)
    size_key = jnp.where(near, sizes, -1.0)
    best_near = jnp.argmax(size_key)
    # single-cluster fallback: accepted unconditionally
    size_key_all = jnp.where(is_cluster, sizes, -1.0)
    best_any = jnp.argmax(size_key_all)

    use_fallback = (n_clusters == 1) & (jnp.sum(near) == 0)
    chosen = jnp.where(use_fallback, best_any, best_near)
    ok = (jnp.sum(near) > 0) | use_fallback

    sel = mask & (labels == chosen) & ok
    return sel, ok


def euclidean_filter(pts: jnp.ndarray, mask: jnp.ndarray, center: jnp.ndarray,
                     tol: float, min_size: int, center_dis: float,
                     outer_iters: int = 8, exact: bool = False,
                     grid_pts: jnp.ndarray | None = None,
                     grid_cells: jnp.ndarray | None = None,
                     grid_leaf: float | None = None):
    """Full Euclidean-filter stage: cluster + select. Returns (sel_mask, ok).

    When ``grid_pts``/``grid_cells``/``grid_leaf`` are given (the points in
    the frame whose voxelization produced the cells — see
    connected_components_grid), the O(N*C) grid path computes the labels;
    ``pts``/``center`` are still used for the selection distances (they may
    live in a different rigid frame).
    """
    if grid_pts is not None:
        labels = connected_components_grid(grid_pts, grid_cells, mask, tol,
                                           grid_leaf,
                                           outer_iters=outer_iters)
    else:
        # NOTE: connected_components_compact is NOT used here although
        # the plane filter discards ~half the lanes: this function runs
        # under the extractor's vmap over detections, where its lax.cond
        # lowers to select and BOTH branches execute — measured +38% on
        # the 16384-tier extraction instead of -4x (BENCH_DETAILS r3).
        # The compacted path remains available for non-vmapped callers.
        labels = connected_components(pts, mask, tol,
                                      outer_iters=outer_iters, exact=exact)
    return select_cluster(pts, mask, labels, center, min_size, center_dis)
