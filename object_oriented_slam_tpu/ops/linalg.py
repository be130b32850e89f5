"""Closed-form small linear algebra.

``jnp.linalg.inv``/``solve`` lower to LU factorizations with row pivoting,
which execute as serial scalar loops on TPU -- catastrophic when vmapped
over hundreds of thousands of tiny matrices in the BA inner loop.  These
adjugate/cofactor closed forms are pure elementwise VPU math and vectorize
perfectly under vmap/jacfwd.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-30


def det3(m: jnp.ndarray) -> jnp.ndarray:
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]))


def inv3(m: jnp.ndarray) -> jnp.ndarray:
    """Adjugate inverse of (...,3,3)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, D, G], axis=-1),
        jnp.stack([B, E, H], axis=-1),
        jnp.stack([C, F, I], axis=-1),
    ], axis=-2)
    return adj / (det[..., None, None] + jnp.where(det[..., None, None] == 0,
                                                   _EPS, 0.0))


def solve3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cramer solve of (...,3,3) @ x = (...,3)."""
    return jnp.einsum("...ij,...j->...i", inv3(m), v)


def chol_solve_small(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve SPD A x = b for small static n via fully unrolled Cholesky.

    jnp.linalg.solve's pivoted LU costs ~1 ms per batched 9x9 solve on TPU
    (serial pivot loops); this unrolls n=O(10) steps into plain arithmetic
    that vmaps into wide VPU lanes.  A must be symmetric positive definite
    (H + lambda*I always is).
    """
    n = A.shape[-1]
    eps = jnp.asarray(1e-20, A.dtype)
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def inv4(m: jnp.ndarray) -> jnp.ndarray:
    """Cofactor inverse of (...,4,4) (used off the hot path for parity ops)."""
    # expansion by 2x2 minors (standard SIMD-friendly form)
    m00, m01, m02, m03 = (m[..., 0, 0], m[..., 0, 1], m[..., 0, 2], m[..., 0, 3])
    m10, m11, m12, m13 = (m[..., 1, 0], m[..., 1, 1], m[..., 1, 2], m[..., 1, 3])
    m20, m21, m22, m23 = (m[..., 2, 0], m[..., 2, 1], m[..., 2, 2], m[..., 2, 3])
    m30, m31, m32, m33 = (m[..., 3, 0], m[..., 3, 1], m[..., 3, 2], m[..., 3, 3])

    s0 = m00 * m11 - m10 * m01
    s1 = m00 * m12 - m10 * m02
    s2 = m00 * m13 - m10 * m03
    s3 = m01 * m12 - m11 * m02
    s4 = m01 * m13 - m11 * m03
    s5 = m02 * m13 - m12 * m03

    c5 = m22 * m33 - m32 * m23
    c4 = m21 * m33 - m31 * m23
    c3 = m21 * m32 - m31 * m22
    c2 = m20 * m33 - m30 * m23
    c1 = m20 * m32 - m30 * m22
    c0 = m20 * m31 - m30 * m21

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    invdet = 1.0 / (det + jnp.where(det == 0, _EPS, 0.0))

    r00 = (m11 * c5 - m12 * c4 + m13 * c3) * invdet
    r01 = (-m01 * c5 + m02 * c4 - m03 * c3) * invdet
    r02 = (m31 * s5 - m32 * s4 + m33 * s3) * invdet
    r03 = (-m21 * s5 + m22 * s4 - m23 * s3) * invdet
    r10 = (-m10 * c5 + m12 * c2 - m13 * c1) * invdet
    r11 = (m00 * c5 - m02 * c2 + m03 * c1) * invdet
    r12 = (-m30 * s5 + m32 * s2 - m33 * s1) * invdet
    r13 = (m20 * s5 - m22 * s2 + m23 * s1) * invdet
    r20 = (m10 * c4 - m11 * c2 + m13 * c0) * invdet
    r21 = (-m00 * c4 + m01 * c2 - m03 * c0) * invdet
    r22 = (m30 * s4 - m31 * s2 + m33 * s0) * invdet
    r23 = (-m20 * s4 + m21 * s2 - m23 * s0) * invdet
    r30 = (-m10 * c3 + m11 * c1 - m12 * c0) * invdet
    r31 = (m00 * c3 - m01 * c1 + m02 * c0) * invdet
    r32 = (-m30 * s3 + m31 * s1 - m32 * s0) * invdet
    r33 = (m20 * s3 - m21 * s1 + m22 * s0) * invdet

    row0 = jnp.stack([r00, r01, r02, r03], axis=-1)
    row1 = jnp.stack([r10, r11, r12, r13], axis=-1)
    row2 = jnp.stack([r20, r21, r22, r23], axis=-1)
    row3 = jnp.stack([r30, r31, r32, r33], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=-2)
