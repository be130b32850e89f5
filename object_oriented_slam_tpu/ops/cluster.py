"""Euclidean clustering (connected components of the radius graph).

Replaces PCL ``EuclideanClusterExtraction`` + KdTree
(src/pca/EllipsoidExtractor.cpp:646-737): points closer than ``tolerance``
are connected; connected components are clusters; clusters smaller than
``min_size`` are dropped; the selected cluster is the largest one whose
minimum distance to the 2D-center-estimate is below ``center_dis``
(PCL returns clusters sorted by size descending; single-cluster frames are
accepted unconditionally, EllipsoidExtractor.cpp:696-714).

TPU-shaped algorithm: iterative minimum-label propagation over the radius
graph, evaluated in row-blocks so the N x N distance matrix is never
materialized, interleaved with pointer-jumping to collapse long chains in
O(log N) extra steps.  The default distance pass computes the pairwise
cross term as a [B,3]x[3,N] matmul (MXU) with the norm expansion
d2 = |x|^2 + |y|^2 - 2 x.y on centroid-shifted coordinates; centering
bounds the f32 cancellation error of the expansion to ~1e-8 m^2 on
meter-scale clouds (a +-3e-5 m perturbation of the 2 cm radius --
far below depth-sensor noise; measured 3x faster than the exact
broadcast form on TPU v5e).  ``exact=True`` selects the direct
(x-y)^2 broadcast pass (bit-faithful radius test on f32 inputs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 512


def _min_label_pass(pts, mask, labels, tol2):
    """One exact pass: label_i <- min over neighbors j of label_j."""
    N = pts.shape[0]
    n_blocks = (N + _BLOCK - 1) // _BLOCK
    pts_pad = jnp.pad(pts, ((0, n_blocks * _BLOCK - N), (0, 0)))
    mask_pad = jnp.pad(mask, (0, n_blocks * _BLOCK - N))

    def body(carry, b):
        block_pts = jax.lax.dynamic_slice(pts_pad, (b * _BLOCK, 0),
                                          (_BLOCK, 3))
        block_mask = jax.lax.dynamic_slice(mask_pad, (b * _BLOCK,), (_BLOCK,))
        # [B, N] squared distances
        d2 = jnp.sum((block_pts[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        adj = (d2 <= tol2) & block_mask[:, None] & mask[None, :]
        neigh = jnp.where(adj, labels[None, :], jnp.int32(2 ** 30))
        new_block = jnp.min(neigh, axis=1)
        return carry, new_block

    _, blocks = jax.lax.scan(body, None, jnp.arange(n_blocks))
    new_labels = blocks.reshape(-1)[:N]
    return jnp.where(mask, jnp.minimum(labels, new_labels), labels)


def _min_label_pass_mm(pts, nrm, mask, labels, tol2):
    """One MXU pass over pre-centered points with precomputed |x|^2."""
    N = pts.shape[0]
    n_blocks = (N + _BLOCK - 1) // _BLOCK
    pts_pad = jnp.pad(pts, ((0, n_blocks * _BLOCK - N), (0, 0)))
    nrm_pad = jnp.pad(nrm, (0, n_blocks * _BLOCK - N))
    mask_pad = jnp.pad(mask, (0, n_blocks * _BLOCK - N))

    def body(carry, b):
        block_pts = jax.lax.dynamic_slice(pts_pad, (b * _BLOCK, 0),
                                          (_BLOCK, 3))
        block_nrm = jax.lax.dynamic_slice(nrm_pad, (b * _BLOCK,), (_BLOCK,))
        block_mask = jax.lax.dynamic_slice(mask_pad, (b * _BLOCK,), (_BLOCK,))
        cross = jax.lax.dot_general(block_pts, pts, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        d2 = block_nrm[:, None] + nrm[None, :] - 2.0 * cross
        adj = (d2 <= tol2) & block_mask[:, None] & mask[None, :]
        neigh = jnp.where(adj, labels[None, :], jnp.int32(2 ** 30))
        return carry, jnp.min(neigh, axis=1)

    _, blocks = jax.lax.scan(body, None, jnp.arange(n_blocks))
    new_labels = blocks.reshape(-1)[:N]
    return jnp.where(mask, jnp.minimum(labels, new_labels), labels)


def _chain_seed_one(pts, mask, labels0, tol2, key):
    """One seeding pass along the sort order of ``key`` (see _chain_seed)."""
    key = jnp.where(mask, key, jnp.int32(2 ** 30))
    order = jnp.argsort(key)
    pts_s = pts[order]
    lab_s = labels0[order]
    mask_s = mask[order]

    d2prev = jnp.sum((pts_s[1:] - pts_s[:-1]) ** 2, axis=-1)
    linked = jnp.concatenate([jnp.array([False]),
                              (d2prev <= tol2) & mask_s[1:] & mask_s[:-1]])

    # segmented running min over linked runs: (value, is_start) pairs
    def combine(a, b):
        av, astart = a
        bv, bstart = b
        v = jnp.where(bstart, bv, jnp.minimum(av, bv))
        return v, astart | bstart

    seeded_s, _ = jax.lax.associative_scan(
        combine, (lab_s, ~linked), axis=0)
    inv = jnp.argsort(order)
    return jnp.where(mask, seeded_s[inv], labels0)


def _chain_seed(pts, mask, labels0, tol2, n_orders: int = 1):
    """Cheap label seeding along spatial sort orders.

    Sorts points by a Morton-ish voxel key, links consecutive points that
    are genuinely within ``tol`` (a SUBSET of the true radius graph, so
    the final converged components are unchanged), and propagates the
    running minimum along each linked run with one associative scan —
    O(N log N), no [B, N] distance pass.  Dense clouds then start the
    exact min-label rounds mostly pre-merged, cutting global rounds.
    ``n_orders`` > 1 chains additional axis-major key orders (each pass
    consumes the previous labels, so merges compose); clouds that break
    into many runs under one axis order often form long runs under
    another.
    """
    tol = jnp.sqrt(tol2)
    cell = jnp.floor(pts / tol).astype(jnp.int32)
    c = jnp.clip(cell + 512, 0, 1023)
    keys = ((c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2],
            (c[:, 1] << 20) | (c[:, 2] << 10) | c[:, 0],
            (c[:, 2] << 20) | (c[:, 0] << 10) | c[:, 1])
    labels = labels0
    for key in keys[:n_orders]:
        labels = _chain_seed_one(pts, mask, labels, tol2, key)
    return labels


def connected_components(pts: jnp.ndarray, mask: jnp.ndarray, tol: float,
                         outer_iters: int = 8, jump_iters: int = 12,
                         exact: bool = False, seed_orders: int = 1):
    """Labels [N]: each point's component id = min point index in component.

    Masked-out points get label N (out of range).  Min-label propagation +
    pointer jumping runs inside a while_loop with a convergence check:
    typical object clouds settle in 1-2 rounds, while ``outer_iters``
    bounds pathological chain topologies.
    """
    N = pts.shape[0]
    tol2 = jnp.float32(tol * tol)
    idx = jnp.arange(N, dtype=jnp.int32)
    labels0 = jnp.where(mask, idx, jnp.int32(N))
    labels0 = _chain_seed(pts, mask, labels0, tol2, n_orders=seed_orders)

    if not exact:
        # center once (labels are translation-invariant; see module docstring)
        c = jnp.sum(jnp.where(mask[:, None], pts, 0.0), axis=0) / \
            jnp.maximum(jnp.sum(mask), 1).astype(pts.dtype)
        pts_c = jnp.where(mask[:, None], pts - c, 0.0)
        nrm = jnp.sum(pts_c * pts_c, axis=-1)

    def round_fn(labels):
        if exact:
            labels = _min_label_pass(pts, mask, labels, tol2)
        else:
            labels = _min_label_pass_mm(pts_c, nrm, mask, labels, tol2)

        def jump(lab, _):
            safe = jnp.clip(lab, 0, N - 1)
            nxt = jnp.where(lab < N, lab[safe], lab)
            return nxt, None

        labels, _ = jax.lax.scan(jump, labels, None, length=jump_iters)
        return labels

    def cond(state):
        labels, prev_changed, it = state
        return prev_changed & (it < outer_iters)

    def body(state):
        labels, _, it = state
        new = round_fn(labels)
        changed = jnp.any(new != labels)
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (round_fn(labels0), jnp.bool_(True), jnp.int32(1)))
    return labels


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
                     seed_orders: int = 1):
    """Full Euclidean-filter stage: cluster + select. Returns (sel_mask, ok)."""
    labels = connected_components(pts, mask, tol, outer_iters=outer_iters,
                                  exact=exact, seed_orders=seed_orders)
    return select_cluster(pts, mask, labels, center, min_size, center_dis)
