"""Voxel-grid downsampling (fixed-capacity, masked).

Replaces PCL ``VoxelGrid`` / ``DownSamplePointCloudOnly``
(src/symmetry/PointCloudFilter.cpp:249-261): points are bucketed into
``leaf``-sized cells and each occupied cell emits the centroid of its
points.  TPU-shaped algorithm: encode each point's cell as a single
integer key, sort by key (XLA sort = fast on TPU), detect segment
boundaries, and segment-mean into a fixed-capacity output.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as _np

# numpy (not jnp) so importing the module does not initialize the backend
_INVALID = _np.int32(2 ** 30)


def voxel_cells(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float):
    """Integer cell coordinates per point (absolute, unshifted)."""
    return jnp.floor(pts / leaf).astype(jnp.int32)


def voxel_keys(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float):
    """Integer cell key per point; invalid points get a sentinel key.

    Cells are shifted by the masked minimum (not a fixed +512) so the
    10-bit-per-axis packing is collision-free for clouds spanning up to
    1024 leafs per axis (a fixed offset clipped camera-frame clouds
    beyond 5.11 m into one megacell).
    """
    cell = voxel_cells(pts, mask, leaf)
    big = jnp.int32(2 ** 30)
    cmin = jnp.min(jnp.where(mask[:, None], cell, big), axis=0)
    c = jnp.clip(cell - cmin, 0, 1023)
    key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
    return jnp.where(mask, key, _INVALID), cmin


def _voxel_core(pts, attrs, mask, leaf: float, capacity: int):
    """Shared downsample body: sort by cell key, segment-mean points (and
    optional per-point attributes) into a fixed-capacity prefix.

    Returns (out_pts, out_attrs | None, out_cells, out_mask).  Cells come
    from the downsample's own keys (decoding the segment key rather than
    re-flooring the centroid, which can land in the next cell under f32
    rounding), so each unmasked output point has a unique cell — the
    precondition for the grid-hash clustering path (ops/cluster.py).
    """
    key, cmin = voxel_keys(pts, mask, leaf)
    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    valid_s = key_s != _INVALID

    is_new = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])
    is_new = is_new & valid_s
    seg = jnp.cumsum(is_new) - 1          # segment index per point
    seg = jnp.where(valid_s, seg, capacity)  # dump invalids past the end

    sums = jax.ops.segment_sum(pts_s, seg, num_segments=capacity + 1)
    cnts = jax.ops.segment_sum(jnp.ones_like(seg, jnp.float32), seg,
                               num_segments=capacity + 1)
    # all keys within a segment are equal, so summing only the first
    # element recovers the segment key with the same scatter-ADD the
    # surrounding reductions use (a scatter-MIN here compiled
    # pathologically on the remote TPU service)
    keys_out = jax.ops.segment_sum(jnp.where(is_new, key_s, 0), seg,
                                   num_segments=capacity + 1)
    c = jnp.maximum(cnts[:capacity, None], 1.0)
    out_mask = cnts[:capacity] > 0
    out = jnp.where(out_mask[:, None], sums[:capacity] / c, 0.0)
    k = jnp.where(out_mask, keys_out[:capacity], 0)
    cells = jnp.stack([(k >> 20) & 1023, (k >> 10) & 1023, k & 1023],
                      axis=1) + cmin
    cells = jnp.where(out_mask[:, None], cells, 0)

    out_a = None
    if attrs is not None:
        asum = jax.ops.segment_sum(attrs[order], seg,
                                   num_segments=capacity + 1)
        a2d = asum[:capacity].reshape(capacity, -1)
        out_a = jnp.where(out_mask[:, None], a2d / c,
                          0.0).reshape(asum[:capacity].shape)
    return out, out_a, cells, out_mask


def voxel_downsample_cells(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                           capacity: int):
    """Downsample to at most ``capacity`` cell centroids.

    Returns (out_pts [capacity, 3], out_cells [capacity, 3] int32 absolute
    cell coordinates, out_mask [capacity]).
    """
    out, _, cells, out_mask = _voxel_core(pts, None, mask, leaf, capacity)
    return out, cells, out_mask


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     capacity: int):
    """Downsample to at most ``capacity`` cell centroids.

    Returns (out_pts [capacity, 3], out_mask [capacity]).
    """
    out, _, _, out_mask = _voxel_core(pts, None, mask, leaf, capacity)
    return out, out_mask


def voxel_downsample_full(pts: jnp.ndarray, attrs: jnp.ndarray,
                          mask: jnp.ndarray, leaf: float, capacity: int):
    """Downsample with attributes AND cell coordinates.
    Returns (pts, attrs, cells, mask)."""
    return _voxel_core(pts, attrs, mask, leaf, capacity)


def voxel_downsample_attrs(pts: jnp.ndarray, attrs: jnp.ndarray,
                           mask: jnp.ndarray, leaf: float, capacity: int):
    """Like voxel_downsample but also averages per-point attributes
    (e.g. RGB, border flags) within each cell.
    Returns (pts, attrs, mask)."""
    out, out_a, _, out_mask = _voxel_core(pts, attrs, mask, leaf, capacity)
    return out, out_a, out_mask
