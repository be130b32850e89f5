"""Depth -> point cloud kernels (fixed-shape, masked).

TPU-native replacement for the reference's pixel loops:
  * ``getPointCloudInRect`` (src/symmetry/PointCloudFilter.cpp:21-61):
    bbox region scanned with stride 3, depth gated to (0.1, range].
  * full-image back-projection (src/core/Geometry.cpp:8-41,
    src/plane/PlaneExtractor.cpp:31-49).
  * center sampling ``GetCenter`` (src/pca/EllipsoidExtractor.cpp:583-643):
    10x10 samples around the bbox center.
  * ray-length depth map ``getProjDepthMat`` (src/symmetry/Symmetry.cpp:137-161).

All outputs are fixed-capacity arrays + validity masks so a whole frame of
detections can be processed as one batched device program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.camera import Camera

# stride-3 scan of a full 640x480 image fits in a (160, 214) grid
BBOX_GRID_H = 160
BBOX_GRID_W = 214
STRIDE = 3  # PointCloudFilter.cpp:31-32


def bbox_point_cloud(depth: jnp.ndarray, bbox: jnp.ndarray, cam: Camera,
                     depth_range: float, row0=0, hw=None):
    """Strided back-projection of the bbox region.

    depth: [H, W] uint16/float; bbox: (4,) x1 y1 x2 y2 (float, may be
    fractional; truncated like the reference's int casts).
    Returns (points [BBOX_GRID_H*BBOX_GRID_W, 3] camera-frame, mask [*]).

    ``row0``/``hw``: multi-frame batches stack B frames' depths as ONE
    [B*H, W] array and give each detection its frame's row offset — the
    depth stays an UNMAPPED 2D gather operand under the detection vmap
    (a per-detection [H, W] operand batches into a 3D gather, which this
    toolchain executes an order of magnitude slower; measured 17 ms vs
    ~2 ms per detection, 2026-08-21).
    """
    H, W = hw if hw is not None else depth.shape
    x1 = jnp.clip(bbox[0].astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(bbox[1].astype(jnp.int32), 0, H - 1)
    x2 = jnp.clip(bbox[2].astype(jnp.int32), 0, W)
    y2 = jnp.clip(bbox[3].astype(jnp.int32), 0, H)

    gh = (H + STRIDE - 1) // STRIDE
    gw = (W + STRIDE - 1) // STRIDE
    jj = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    px = x1 + STRIDE * jj
    py = y1 + STRIDE * ii
    in_box = (px < x2) & (py < y2)

    # A contiguous [H, W] window at (row0+y1, x1) out of the zero-padded
    # image, subsampled by the stride, reads exactly depth[y1+S*i,
    # x1+S*j] for all in-frame grid positions — identical values to the
    # explicit 2D gather it replaces, but as a block copy: the gather
    # executed at ~16 ns/element on this toolchain (~4 ms per 640x480
    # detection, the single most expensive op of extraction phase A,
    # measured 2026-08-21).  The padding guarantees the dynamic_slice
    # never clamps, so grid positions stay exact; padded reads are 0 ->
    # z=0 -> masked invalid, and in_box already excludes them.
    dp = jnp.pad(depth, ((0, H), (0, W)))
    win = jax.lax.dynamic_slice(dp, (row0 + y1, x1), (H, W))
    d = win[::STRIDE, ::STRIDE].astype(jnp.float32)
    z = d / cam.scale
    valid = in_box & (z > 0.1) & (z <= depth_range)

    pxc = jnp.clip(px, 0, W - 1)
    pyc = jnp.clip(py, 0, H - 1)
    x = (pxc.astype(jnp.float32) - cam.cx) * z / cam.fx
    y = (pyc.astype(jnp.float32) - cam.cy) * z / cam.fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    return pts, valid.reshape(-1)


def bbox_pixel_lookup(attr_map: jnp.ndarray, bbox: jnp.ndarray, row0=0,
                      hw=None):
    """Sample a per-pixel attribute map at the SAME strided grid as
    ``bbox_point_cloud`` so the result aligns row-for-row with its point
    output (used to tag each back-projected point with its depth-border
    flag for the sparse symmetry mode, BorderExtractor.cpp:58-132).

    attr_map: [H, W] (bool or float); returns [BBOX_GRID_H*BBOX_GRID_W]
    float32.  ``row0``/``hw``: see bbox_point_cloud.
    """
    H, W = hw if hw is not None else attr_map.shape
    x1 = jnp.clip(bbox[0].astype(jnp.int32), 0, W - 1)
    y1 = jnp.clip(bbox[1].astype(jnp.int32), 0, H - 1)
    # same window+stride pattern as bbox_point_cloud (see there): the
    # grids align row-for-row; out-of-frame positions read the pad's
    # zeros, and those rows are masked invalid by the point grid anyway
    dp = jnp.pad(attr_map, ((0, H), (0, W)))
    win = jax.lax.dynamic_slice(dp, (row0 + y1, x1), (H, W))
    return win[::STRIDE, ::STRIDE].astype(jnp.float32).reshape(-1)


def full_point_cloud(depth: jnp.ndarray, cam: Camera, stride: int = 1,
                     depth_range: float = jnp.inf):
    """Full-image back-projection (organized), [H//s, W//s, 3] + mask."""
    d = depth[::stride, ::stride].astype(jnp.float32)
    H, W = d.shape
    z = d / cam.scale
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) * stride
    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) * stride
    x = (jj - cam.cx) * z / cam.fx
    y = (ii - cam.cy) * z / cam.fy
    mask = (z > 1e-6) & (z <= depth_range)
    return jnp.stack([x, y, z], axis=-1), mask


def center_estimate(depth: jnp.ndarray, bbox: jnp.ndarray, cam: Camera,
                    depth_range: float, row0=0, hw=None):
    """10x10-sample 3D center estimate in camera frame
    (EllipsoidExtractor.cpp:583-643).

    Returns (center (3,), ok scalar bool) -- ok requires >= 2 valid
    samples.  ``row0``/``hw``: see bbox_point_cloud.
    """
    H, W = hw if hw is not None else depth.shape
    xc = ((bbox[0] + bbox[2]) / 2.0).astype(jnp.int32)
    yc = ((bbox[1] + bbox[3]) / 2.0).astype(jnp.int32)
    n = 10
    x_delta = (jnp.abs(bbox[0] - bbox[2]) / 4.0 / n).astype(jnp.int32)
    y_delta = (jnp.abs(bbox[1] - bbox[3]) / 4.0 / n).astype(jnp.int32)

    ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) - n // 2
    jds = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) - n // 2
    px = jnp.clip(xc + jds * x_delta, 0, W - 1)
    py = jnp.clip(yc + ids * y_delta, 0, H - 1)
    z = depth[row0 + py, px].astype(jnp.float32) / cam.scale
    valid = (z > 0.1) & (z <= depth_range)

    x = (px.astype(jnp.float32) - cam.cx) * z / cam.fx
    y = (py.astype(jnp.float32) - cam.cy) * z / cam.fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    w = valid.reshape(-1).astype(jnp.float32)
    count = jnp.sum(w)
    center = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(count, 1.0)
    return center, count >= 2


def proj_depth_map(depth: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """Plane-depth -> ray-length depth, elementwise (Symmetry.cpp:137-161):
    d' = d * sqrt(xi^2 + f^2 + yi^2) / f with xi = x-cx, yi = y-cy."""
    H, W = depth.shape
    xi = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cam.cx
    yi = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cam.cy
    f = cam.fx
    scale = jnp.sqrt(xi * xi + f * f + yi * yi) / f
    return depth.astype(jnp.float32) * scale
