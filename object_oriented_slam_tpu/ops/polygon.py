"""Convex polygon intersection and ellipsoid 3D IoU.

Replaces the vendored ``src/Polygon/Polygon.cpp`` (Sutherland-Hodgman
clipping, fixed 64-point storage) and the axis-aligned ellipsoid IoU of
``src/core/Ellipsoid.cpp:346-466`` (XY footprint intersection x Z overlap).

Fixed-capacity jnp implementation: polygons are [N, 2] vertex arrays with a
vertex count; clipping one convex polygon against each edge of another runs
as a static unrolled loop with masked vertices, so the whole IoU is one
jit-friendly program (the reference rasterizes at 1 mm resolution through
OpenCV integer points; here the clip is exact).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import se3

MAX_VERTS = 16


def _clip_against_edge(verts, count, a, b):
    """Clip polygon (verts [M,2], count) by half-plane left of edge a->b."""
    M = verts.shape[0]
    idx = jnp.arange(M)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)

    e = b - a
    def side(p):
        return e[0] * (p[..., 1] - a[1]) - e[1] * (p[..., 0] - a[0])

    cur = verts
    nxt_v = verts[nxt]
    s_cur = side(cur)
    s_nxt = side(nxt_v)
    # CCW polygons: interior is to the left of each directed edge
    inside_cur = s_cur >= 0.0
    inside_nxt = s_nxt >= 0.0

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    inter = cur + t[:, None] * (nxt_v - cur)

    # each input edge emits up to 2 vertices
    emit_cur = inside_cur & valid
    emit_int = (inside_cur != inside_nxt) & valid

    out_v = jnp.zeros((2 * M, 2))
    out_m = jnp.zeros(2 * M, bool)
    out_v = out_v.at[0::2].set(cur)
    out_v = out_v.at[1::2].set(inter)
    out_m = out_m.at[0::2].set(emit_cur)
    out_m = out_m.at[1::2].set(emit_int)

    # compact emitted vertices to the front
    order = jnp.argsort(~out_m, stable=True)
    out_v = out_v[order][:M]
    new_count = jnp.minimum(jnp.sum(out_m), M)
    return out_v, new_count


def intersect_convex(poly_a, count_a, poly_b, count_b):
    """Intersection polygon of two convex CCW polygons (fixed capacity)."""
    verts, count = poly_a, count_a

    def body(carry, i):
        verts, count = carry
        a = poly_b[i]
        b = poly_b[jnp.where(i + 1 >= count_b, 0, i + 1)]
        nv, nc = _clip_against_edge(verts, count, a, b)
        use = i < count_b
        verts = jnp.where(use, nv, verts)
        count = jnp.where(use, nc, count)
        return (verts, count), None

    (verts, count), _ = jax.lax.scan(body, (verts, count),
                                     jnp.arange(poly_b.shape[0]))
    return verts, count


def polygon_area(verts, count):
    """Shoelace area of the first ``count`` CCW vertices."""
    M = verts.shape[0]
    idx = jnp.arange(M)
    valid = idx < count
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    x, y = verts[:, 0], verts[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _rect_poly(hx, hy):
    """CCW rectangle centered at origin, padded to MAX_VERTS."""
    v = jnp.zeros((MAX_VERTS, 2))
    v = v.at[0].set(jnp.stack([hx, -hy]))
    v = v.at[1].set(jnp.stack([hx, hy]))
    v = v.at[2].set(jnp.stack([-hx, hy]))
    v = v.at[3].set(jnp.stack([-hx, -hy]))
    return v, jnp.int32(4)


def ellipsoid_iou_3d(e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned-cube IoU of two ellipsoids (Ellipsoid.cpp:346-466).

    Like the reference: e2 is expressed in e1's body frame; footprints are
    the xy rectangles (e1 axis-aligned, e2 rotated by the relative yaw),
    intersection area x z-overlap over the union of cube volumes.
    Returns IoU (the reference returns 1 - IoU as "MIoU error").
    """
    rel = se3.se3_mul(se3.se3_inv(e1[:7]), e2[:7])
    rpy = se3.quat_to_euler_zyx(rel[3:])
    yaw = rpy[2]

    a1, b1, c1 = jnp.abs(e1[7]), jnp.abs(e1[8]), jnp.abs(e1[9])
    a2, b2, c2 = jnp.abs(e2[7]), jnp.abs(e2[8]), jnp.abs(e2[9])

    p1, n1 = _rect_poly(a1, b1)

    # rotated rectangle of e2 at its relative xy offset
    cz, sz = jnp.cos(yaw), jnp.sin(yaw)
    Rz = jnp.array([[cz, -sz], [sz, cz]])
    base = jnp.array([[1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [-1.0, -1.0]])
    corners = (base * jnp.stack([a2, b2])) @ Rz.T + rel[:2]
    p2 = jnp.zeros((MAX_VERTS, 2)).at[:4].set(corners)
    n2 = jnp.int32(4)

    inter_v, inter_n = intersect_convex(p1, n1, p2, n2)
    inter_area = polygon_area(inter_v, inter_n)

    # z overlap (Ellipsoid.cpp:351-372)
    z2 = rel[2]
    lo = jnp.maximum(-c1, z2 - c2)
    hi = jnp.minimum(c1, z2 + c2)
    z_len = jnp.maximum(hi - lo, 0.0)

    vol_inter = inter_area * z_len
    vol1 = 8.0 * a1 * b1 * c1
    vol2 = 8.0 * a2 * b2 * c2
    return vol_inter / jnp.maximum(vol1 + vol2 - vol_inter, 1e-12)
