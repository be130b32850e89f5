"""Synthetic multi-object RGB-D sequence generator.

The reference ships exactly one 58-frame demo subset (fr3_cabinet,
``/root/reference/Example/dataset/cabinet/``) and no other evaluation
data.  This module generates TUM-style sequences with a known ground
truth — K ellipsoids standing on a ground plane, an orbiting camera,
analytically ray-traced depth images and projected bounding-box
detections — so many-object scenes (up to the backend's MAX_OBJECTS
capacity) and accuracy metrics (object-center error, 3D IoU vs the true
quadrics) can be exercised without external datasets.

Depth rendering is a single jitted program: for every pixel ray and
every object, the ray-quadric intersection is solved in the ellipsoid
frame (unit-sphere substitution), the ground plane contributes a fourth
surface, and the nearest positive hit wins — an [H, W, K] batched
computation that maps well onto the VPU (no scalar loops).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..core import se3
from ..core.camera import Camera


@dataclasses.dataclass(frozen=True)
class SyntheticScene:
    """Ground truth: K ellipsoids (vec10, world frame) + plane z=0."""
    ellipsoids: np.ndarray      # [K, 10] (t, q, s)
    labels: np.ndarray          # [K] int
    camera: Camera


def make_scene(n_objects: int = 12, seed: int = 0,
               camera: Camera | None = None,
               radius_range=(0.4, 1.5),
               scale_range=(0.15, 0.45),
               labels=None) -> SyntheticScene:
    """Objects on a ring inside the camera orbit, resting on z=0.

    ``radius_range`` sets the object-ring radii: the default reproduces
    the historical dense layout (adjacent spacing can fall well under
    the reference's 1.0 m association gate, DataAssociation.cpp:94); a
    narrow high band like (1.5, 1.9) spaces 8 objects ~1.3 m apart for
    association-focused evaluations.
    """
    rng = np.random.RandomState(seed)
    if camera is None:
        camera = Camera(fx=535.4, fy=539.2, cx=320.1, cy=247.6,
                        scale=5000.0, width=640, height=480)
    ang = np.linspace(0, 2 * np.pi, n_objects, endpoint=False)
    ang += rng.uniform(-0.25, 0.25, n_objects) / max(n_objects, 1)
    r = rng.uniform(*radius_range, n_objects)
    sc = rng.uniform(*scale_range, (n_objects, 3))
    yaw = rng.uniform(0, 2 * np.pi, n_objects)
    vecs = np.zeros((n_objects, 10))
    vecs[:, 0] = r * np.cos(ang)
    vecs[:, 1] = r * np.sin(ang)
    vecs[:, 2] = sc[:, 2]                       # resting on the plane
    vecs[:, 3] = 0.0
    vecs[:, 4] = 0.0
    vecs[:, 5] = np.sin(yaw / 2)                # yaw-only rotation
    vecs[:, 6] = np.cos(yaw / 2)
    vecs[:, 7:] = sc
    if labels is None:
        labels = rng.choice([56, 57, 58, 59, 60, 61, 62, 63], n_objects)
    return SyntheticScene(ellipsoids=vecs, labels=np.asarray(labels, int),
                          camera=camera)


def orbit_trajectory(n_frames: int, radius: float = 3.2,
                     height: float = 1.4, seed: int = 1,
                     jitter: float = 0.0) -> np.ndarray:
    """Camera poses [F, 7] (t, q) orbiting the origin, looking at it.

    Convention matches TUM groundtruth.txt rows (pose of camera in world,
    x right / y down / z forward camera axes).
    """
    rng = np.random.RandomState(seed)
    poses = np.zeros((n_frames, 7))
    for f in range(n_frames):
        a = 2 * np.pi * f / n_frames
        c = np.array([radius * np.cos(a), radius * np.sin(a), height])
        if jitter:
            c = c + rng.normal(0, jitter, 3)
        look = -c / np.linalg.norm(c)              # at the origin
        up_w = np.array([0.0, 0.0, 1.0])
        x_cam = np.cross(look, up_w)
        x_cam /= np.linalg.norm(x_cam)
        y_cam = np.cross(look, x_cam)              # points "down"
        R_wc = np.stack([x_cam, y_cam, look], axis=1)
        q = _mat_to_quat_np(R_wc)
        poses[f, :3] = c
        poses[f, 3:] = q
    return poses


def _mat_to_quat_np(m):
    t = np.trace(m)
    if t > 0:
        w = np.sqrt(1.0 + t) / 2
        x = (m[2, 1] - m[1, 2]) / (4 * w)
        y = (m[0, 2] - m[2, 0]) / (4 * w)
        z = (m[1, 0] - m[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + m[i, i] - m[j, j] - m[k, k], 1e-12)) * 2
        v = np.zeros(3)
        v[i] = s / 4
        v[j] = (m[j, i] + m[i, j]) / s
        v[k] = (m[k, i] + m[i, k]) / s
        x, y, z = v
        w = (m[k, j] - m[j, k]) / s
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# analytic depth rendering
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam",))
def render_depth(ellipsoids, pose_wc, cam: Camera, plane_z: float = 0.0):
    """Ray-traced uint16-style depth [H, W] (TUM scale) of the scene.

    ellipsoids: [K, 10] world vec10; pose_wc: (7,) camera pose in world.
    Each pixel ray o + t d (camera origin o, direction d in world) is
    intersected with every dual quadric in its own frame: with
    p = R_o^T (x - t_o) / s the surface is |p| = 1, a quadratic in t.
    """
    H, W = cam.height, cam.width
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)                       # [H, W]
    d_cam = jnp.stack([(uu - cx) / fx, (vv - cy) / fy,
                       jnp.ones_like(uu)], axis=-1)   # [H, W, 3]
    R_wc = se3.quat_to_mat(pose_wc[3:].astype(jnp.float32))
    o = pose_wc[:3].astype(jnp.float32)
    d_w = d_cam @ R_wc.T                              # [H, W, 3]

    def hit_one(e):
        R_o = se3.quat_to_mat(e[3:7])
        s = e[7:]
        # into the (unit-sphere) object frame
        om = ((o - e[:3]) @ R_o) / s                  # [3]
        dm = (d_w @ R_o) / s                          # [H, W, 3]
        A = jnp.sum(dm * dm, axis=-1)
        B = 2.0 * jnp.sum(dm * om, axis=-1)
        C = jnp.sum(om * om) - 1.0
        disc = B * B - 4 * A * C
        ok = disc > 0
        t = (-B - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * A)
        return jnp.where(ok & (t > 0.05), t, jnp.inf)

    t_obj = jax.vmap(hit_one)(ellipsoids.astype(jnp.float32))  # [K, H, W]
    t_min = jnp.min(t_obj, axis=0)

    # ground plane z = plane_z
    dz = d_w[..., 2]
    t_pl = (plane_z - o[2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    t_pl = jnp.where(t_pl > 0.05, t_pl, jnp.inf)
    t_all = jnp.minimum(t_min, t_pl)

    # t is the distance along d_w whose camera-z component is |d_cam| z=1
    # => camera depth = t (d_cam has unit z), TUM 16-bit scale
    depth = jnp.where(jnp.isfinite(t_all), t_all * cam.scale, 0.0)
    depth = jnp.where(depth < 65535.0, depth, 0.0)
    return depth.astype(jnp.int32)


@partial(jax.jit, static_argnames=("cam",))
def project_bboxes(ellipsoids, pose_wc, cam: Camera):
    """Projected bbox [K, 4] + visibility mask (center in front, in image)."""
    from ..core import ellipsoid as ell
    pose_cw = se3.se3_inv(pose_wc.astype(jnp.float32))
    K = jnp.asarray([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    jnp.float32)

    R_cw = se3.quat_to_mat(pose_cw[3:])

    def one(e):
        bbox = ell.project_bbox(e, pose_cw, K)
        c_cam = R_cw @ e[:3] + pose_cw[:3]
        vis = (c_cam[2] > 0.2) & \
            (bbox[0] < cam.width) & (bbox[2] > 0) & \
            (bbox[1] < cam.height) & (bbox[3] > 0) & \
            jnp.all(jnp.isfinite(bbox))
        clipped = jnp.clip(bbox, jnp.asarray([0.0, 0, 0, 0]),
                           jnp.asarray([cam.width - 1.0, cam.height - 1.0,
                                        cam.width - 1.0, cam.height - 1.0]))
        return clipped, vis

    return jax.vmap(one)(ellipsoids.astype(jnp.float32))


class SyntheticDataset:
    """Drop-in analogue of io.tum.TUMDataset for generated scenes.

    frames() yields (i, ts, pose_wc7, depth_i32, rgb=None, det_mat[N,8])
    with detection rows ``id x1 y1 x2 y2 label rate instance`` matching
    the reference bbox format (/root/reference/src/tum_rgbd/io.cpp:277-290)
    with manual instance = object index.
    """

    def __init__(self, scene: SyntheticScene, n_frames: int = 60,
                 orbit_radius: float = 3.2, height: float = 1.4,
                 min_bbox_px: float = 12.0, seed: int = 1):
        self.scene = scene
        self.poses = orbit_trajectory(n_frames, orbit_radius, height,
                                      seed=seed)
        self.min_bbox_px = min_bbox_px
        self.n_frames = n_frames

    def frames(self):
        ell = jnp.asarray(self.scene.ellipsoids.astype(np.float32))
        for f in range(self.n_frames):
            pose = self.poses[f]
            posej = jnp.asarray(pose.astype(np.float32))
            depth = np.asarray(render_depth(ell, posej, self.scene.camera))
            bbs, vis = project_bboxes(ell, posej, self.scene.camera)
            bbs, vis = np.asarray(bbs), np.asarray(vis)
            rows = []
            for k in range(len(bbs)):
                w = bbs[k, 2] - bbs[k, 0]
                h = bbs[k, 3] - bbs[k, 1]
                if not vis[k] or w < self.min_bbox_px or h < self.min_bbox_px:
                    continue
                rows.append([len(rows), *bbs[k], self.scene.labels[k],
                             1.0, k])
            det = np.asarray(rows, np.float64).reshape(-1, 8)
            yield f, float(f) / 30.0, pose, depth, None, det
