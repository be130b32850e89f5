"""Dense RGB-D map builder (visualization-grade reconstruction).

Re-design of ``src/dense_builder/builder.cpp``: per frame, the full RGB-D
image is back-projected, transformed to world by Twc, merged into the
global cloud and voxel-filtered (builder.cpp:46-137).  Here the global map
lives in a fixed-capacity voxel-fused buffer updated by one jitted call per
frame; PCD/PLY export replaces ``saveMap``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.camera import Camera
from ..ops import backproject as bp
from ..ops import voxel as vx


@partial(jax.jit, static_argnames=("cam", "stride", "leaf", "capacity"))
def _fuse_frame(global_pts, global_rgb, global_mask, depth, rgb, pose_wc,
                cam: Camera, stride: int, leaf: float, capacity: int,
                depth_range: float):
    pts_cam, m = bp.full_point_cloud(depth, cam, stride=stride,
                                     depth_range=depth_range)
    pts_cam = pts_cam.reshape(-1, 3)
    m = m.reshape(-1)
    colors = rgb[::stride, ::stride].reshape(-1, 3).astype(jnp.float32)

    R = se3.quat_to_mat(pose_wc[3:])
    pts_w = pts_cam @ R.T + pose_wc[:3]

    all_p = jnp.concatenate([global_pts, pts_w])
    all_c = jnp.concatenate([global_rgb, colors])
    all_m = jnp.concatenate([global_mask, m])
    return vx.voxel_downsample_attrs(all_p, all_c, all_m, leaf, capacity)


class DenseBuilder:
    """Accumulates a voxel-fused global color cloud (host-facing API)."""

    def __init__(self, cam: Camera, leaf: float = 0.01, stride: int = 4,
                 capacity: int = 1 << 19, depth_range: float = 6.0):
        self.cam = cam
        self.leaf = leaf
        self.stride = stride
        self.capacity = capacity
        self.depth_range = depth_range
        self.pts = jnp.zeros((capacity, 3))
        self.rgb = jnp.zeros((capacity, 3))
        self.mask = jnp.zeros(capacity, bool)
        self.current = None  # last frame's local cloud (world frame)

    def process_frame(self, rgb, depth, pose_wc):
        depth = jnp.asarray(np.asarray(depth).astype(np.int32))
        rgb_j = jnp.asarray(np.asarray(rgb, np.float32)
                            if rgb is not None else
                            np.zeros((*depth.shape, 3), np.float32))
        pose = jnp.asarray(np.asarray(pose_wc, np.float32))
        self.pts, self.rgb, self.mask = _fuse_frame(
            self.pts, self.rgb, self.mask, depth, rgb_j, pose, self.cam,
            self.stride, self.leaf, self.capacity, self.depth_range)

    def get_map(self):
        m = np.asarray(self.mask)
        return np.asarray(self.pts)[m], np.asarray(self.rgb)[m]

    def save_ply(self, path: str):
        pts, rgb = self.get_map()
        save_ply(path, pts, rgb)

    def save_pcd(self, path: str):
        pts, rgb = self.get_map()
        save_pcd(path, pts, rgb)

    def save_map(self, path: str):
        """Format chosen by extension (.pcd like the reference, else PLY)."""
        if path.lower().endswith(".pcd"):
            self.save_pcd(path)
        else:
            self.save_ply(path)


def save_pcd(path: str, pts: np.ndarray, rgb: np.ndarray = None):
    """ASCII PCD v0.7 export — the format the reference saves
    (``pcl::io::savePCDFile``, builder.cpp:121-125), loadable by PCL and
    its viewers.  ``rgb`` rows are BGR floats as stored by the builder
    (cv2 channel order); packed into PCL's single float rgb field.
    """
    n = len(pts)
    with_rgb = rgb is not None
    fields = "x y z rgb" if with_rgb else "x y z"
    k = 4 if with_rgb else 3
    with open(path, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n")
        f.write("VERSION 0.7\n")
        f.write(f"FIELDS {fields}\n")
        f.write("SIZE" + " 4" * k + "\n")
        f.write("TYPE" + " F" * k + "\n")
        f.write("COUNT" + " 1" * k + "\n")
        f.write(f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {n}\nDATA ascii\n")
        if with_rgb:
            c = np.clip(rgb, 0, 255).astype(np.uint32)
            packed = (c[:, 2] << 16) | (c[:, 1] << 8) | c[:, 0]  # BGR->RGB
            packed_f = packed.view(np.float32) if packed.dtype.itemsize == 4 \
                else packed.astype(np.uint32).view(np.float32)
            for i in range(n):
                f.write(f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f} "
                        f"{packed_f[i]:.9e}\n")
        else:
            for i in range(n):
                f.write(f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f}\n")


def save_ply(path: str, pts: np.ndarray, rgb: np.ndarray = None):
    """ASCII PLY export (alternative to the reference's PCD save)."""
    n = len(pts)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if rgb is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i, 0]:.4f} {pts[i, 1]:.4f} {pts[i, 2]:.4f}"
            if rgb is not None:
                c = rgb[i].astype(int)
                # builder stores BGR (cv2); emit RGB
                row += f" {c[2]} {c[1]} {c[0]}"
            f.write(row + "\n")
