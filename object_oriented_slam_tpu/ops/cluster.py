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
materialized (each block is a [B, N] distance computation -- dense matmul
shapes that XLA maps well), interleaved with pointer-jumping to collapse
long chains in O(log N) extra steps.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_BLOCK = 512


def _min_label_pass(pts, mask, labels, tol2):
    """One pass: label_i <- min over neighbors j of label_j."""
    N = pts.shape[0]
    n_blocks = (N + _BLOCK - 1) // _BLOCK
    pts_pad = jnp.pad(pts, ((0, n_blocks * _BLOCK - N), (0, 0)))
    lab_pad = jnp.pad(labels, (0, n_blocks * _BLOCK - N),
                      constant_values=jnp.int32(2 ** 30))
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


def connected_components(pts: jnp.ndarray, mask: jnp.ndarray, tol: float,
                         outer_iters: int = 8, jump_iters: int = 12):
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

    def round_fn(labels):
        labels = _min_label_pass(pts, mask, labels, tol2)

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
                     outer_iters: int = 8):
    """Full Euclidean-filter stage: cluster + select. Returns (sel_mask, ok)."""
    labels = connected_components(pts, mask, tol, outer_iters=outer_iters)
    return select_cluster(pts, mask, labels, center, min_size, center_dis)
