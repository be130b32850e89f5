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

_INVALID = jnp.int32(2 ** 30)


def voxel_keys(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float):
    """Integer cell key per point; invalid points get a sentinel key."""
    cell = jnp.floor(pts / leaf).astype(jnp.int32)
    # pack 3x ~10-bit (offset to positive); world coords within +-500 leafs
    c = jnp.clip(cell + 512, 0, 1023)
    key = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
    return jnp.where(mask, key, _INVALID)


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float,
                     capacity: int):
    """Downsample to at most ``capacity`` cell centroids.

    Returns (out_pts [capacity, 3], out_mask [capacity]).
    """
    key = voxel_keys(pts, mask, leaf)
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
    out = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1.0)
    out_mask = cnts[:capacity] > 0
    out = jnp.where(out_mask[:, None], out, 0.0)
    return out, out_mask


def voxel_downsample_attrs(pts: jnp.ndarray, attrs: jnp.ndarray,
                           mask: jnp.ndarray, leaf: float, capacity: int):
    """Like voxel_downsample but also averages per-point attributes
    (e.g. RGB) within each cell. Returns (pts, attrs, mask)."""
    key = voxel_keys(pts, mask, leaf)
    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    attrs_s = attrs[order]
    valid_s = key_s != _INVALID

    is_new = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]])
    is_new = is_new & valid_s
    seg = jnp.cumsum(is_new) - 1
    seg = jnp.where(valid_s, seg, capacity)

    psum = jax.ops.segment_sum(pts_s, seg, num_segments=capacity + 1)
    asum = jax.ops.segment_sum(attrs_s, seg, num_segments=capacity + 1)
    cnts = jax.ops.segment_sum(jnp.ones_like(seg, jnp.float32), seg,
                               num_segments=capacity + 1)
    c = jnp.maximum(cnts[:capacity, None], 1.0)
    out_mask = cnts[:capacity] > 0
    out_p = jnp.where(out_mask[:, None], psum[:capacity] / c, 0.0)
    out_a = jnp.where(out_mask[:, None], asum[:capacity] / c, 0.0)
    return out_p, out_a, out_mask
