import jax.numpy as jnp
import numpy as np

from object_oriented_slam_tpu.ops import polygon as pg


def sq(cx, cy, h):
    v = np.zeros((pg.MAX_VERTS, 2), np.float32)
    v[0] = [cx + h, cy - h]
    v[1] = [cx + h, cy + h]
    v[2] = [cx - h, cy + h]
    v[3] = [cx - h, cy - h]
    return jnp.asarray(v), jnp.int32(4)


def test_area():
    v, n = sq(0, 0, 1)
    assert abs(float(pg.polygon_area(v, n)) - 4.0) < 1e-5


def test_intersect_overlapping_squares():
    a, na = sq(0, 0, 1)
    b, nb = sq(1, 1, 1)
    iv, ic = pg.intersect_convex(a, na, b, nb)
    assert abs(float(pg.polygon_area(iv, ic)) - 1.0) < 1e-4


def test_intersect_disjoint():
    a, na = sq(0, 0, 1)
    b, nb = sq(5, 5, 1)
    iv, ic = pg.intersect_convex(a, na, b, nb)
    assert float(pg.polygon_area(iv, ic)) < 1e-6


def test_intersect_contained():
    a, na = sq(0, 0, 2)
    b, nb = sq(0, 0, 0.5)
    iv, ic = pg.intersect_convex(a, na, b, nb)
    assert abs(float(pg.polygon_area(iv, ic)) - 1.0) < 1e-4


def test_iou_identical():
    e = jnp.asarray(np.array([1, 2, 3, 0, 0, 0, 1, 0.5, 0.4, 0.3], np.float32))
    assert abs(float(pg.ellipsoid_iou_3d(e, e)) - 1.0) < 1e-4


def test_iou_shifted():
    e1 = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32))
    e2 = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 1, 1, 1, 1], np.float32))
    # cubes 2x2x2 shifted by 1 -> inter 1*2*2=4, union 16-4=12 -> 1/3
    assert abs(float(pg.ellipsoid_iou_3d(e1, e2)) - 1.0 / 3.0) < 1e-3


def test_iou_yaw_invariance_90deg():
    # 90-deg rotated cuboid with swapped axes is the same shape -> IoU 1
    from object_oriented_slam_tpu.core import ellipsoid as ell
    e1 = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1, 0.6, 0.3, 0.2], np.float32))
    e2 = ell.rotate_yaw(e1, 1)
    assert abs(float(pg.ellipsoid_iou_3d(e1, e2)) - 1.0) < 1e-3


def test_iou_disjoint_z():
    e1 = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 1, 1, 1, 0.2], np.float32))
    e2 = jnp.asarray(np.array([0, 0, 1, 0, 0, 0, 1, 1, 1, 0.2], np.float32))
    assert float(pg.ellipsoid_iou_3d(e1, e2)) < 1e-6
