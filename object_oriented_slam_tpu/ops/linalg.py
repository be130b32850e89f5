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


def eigh3(A: jnp.ndarray):
    """Closed-form eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns ``(vals (..., 3) ascending, vecs (..., 3, 3) columns)`` like
    ``jnp.linalg.eigh`` (eigenvector signs arbitrary, as there).
    ``jnp.linalg.eigh`` lowers to an iterative factorization that runs as
    a serial scalar loop on TPU — this is the eigen analogue of ``inv3``:
    Smith's trigonometric solution of the characteristic cubic for the
    eigenvalues, then cross-product null-space extraction for the outer
    eigenvectors (the best-separated ones) with the middle one completed
    by orthogonality.  Pure elementwise VPU math; vmaps/jits cleanly.

    Degenerate handling: near-isotropic matrices (all eigenvalues equal)
    return identity vectors; a repeated outer pair falls back to an
    explicit orthogonal complement, so the returned basis is always
    right-handed-orthonormal to f32 roundoff.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    dt = A.dtype
    tiny = jnp.asarray(1e-20 if dt == jnp.float64 else 1e-12, dt)

    q = (a00 + a11 + a22) / 3.0
    p2 = ((a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12))
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    scale = jnp.maximum(p, tiny)
    b00, b11, b22 = (a00 - q) / scale, (a11 - q) / scale, (a22 - q) / scale
    b01, b02, b12 = a01 / scale, a02 / scale, a12 / scale
    detB = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    phi = jnp.arccos(jnp.clip(detB / 2.0, -1.0, 1.0)) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l1 = 3.0 * q - l0 - l2
    vals = jnp.stack([l0, l1, l2], axis=-1)

    # eigenvectors on the SCALE-NORMALIZED matrix B = (A - q I)/p, whose
    # eigenvalues (lam - q)/p are O(1) — cross-product norms then measure
    # RELATIVE eigen-gaps, making the degeneracy thresholds below
    # invariant to the overall magnitude of A (covariances of mm-scale
    # clouds are ~1e-6; absolute thresholds would misfire there)
    B = jnp.stack([
        jnp.stack([b00, b01, b02], axis=-1),
        jnp.stack([b01, b11, b12], axis=-1),
        jnp.stack([b02, b12, b22], axis=-1)], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), A.shape)

    def null_vec(beta):
        """Largest row-cross of (B - beta I): a null vector whose norm^2
        grows with the eigen-gap (robustness score)."""
        M = B - beta[..., None, None] * eye
        c0 = jnp.cross(M[..., 0, :], M[..., 1, :])
        c1 = jnp.cross(M[..., 0, :], M[..., 2, :])
        c2 = jnp.cross(M[..., 1, :], M[..., 2, :])
        n0 = jnp.sum(c0 * c0, axis=-1)
        n1 = jnp.sum(c1 * c1, axis=-1)
        n2 = jnp.sum(c2 * c2, axis=-1)
        best01 = jnp.where((n0 >= n1)[..., None], c0, c1)
        nb01 = jnp.maximum(n0, n1)
        s = jnp.maximum(nb01, n2)
        best = jnp.where((nb01 >= n2)[..., None], best01, c2)
        return best / jnp.sqrt(jnp.maximum(s, tiny))[..., None], s

    vhi, shi = null_vec((l2 - q) / scale)
    vlo, slo = null_vec((l0 - q) / scale)

    # the better-separated outer eigenvalue yields the trustworthy
    # vector; the other is re-orthogonalized against it (or replaced by
    # an explicit orthogonal complement when its pair is repeated)
    hi_primary = shi >= slo
    base = jnp.where(hi_primary[..., None], vhi, vlo)
    other = jnp.where(hi_primary[..., None], vlo, vhi)
    other = other - jnp.sum(other * base, axis=-1, keepdims=True) * base
    on2 = jnp.sum(other * other, axis=-1)
    ax = jnp.where(jnp.abs(base[..., 0:1]) < 0.9,
                   jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dt),
                                    base.shape),
                   jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], dt),
                                    base.shape))
    alt = jnp.cross(base, ax)
    alt = alt / jnp.sqrt(jnp.maximum(jnp.sum(alt * alt, axis=-1),
                                     tiny))[..., None]
    degen = (jnp.minimum(shi, slo) <= 1e-12) | (on2 <= 1e-12)
    other = jnp.where(degen[..., None], alt,
                      other / jnp.sqrt(jnp.maximum(on2, tiny))[..., None])
    v2 = jnp.where(hi_primary[..., None], base, other)
    v0 = jnp.where(hi_primary[..., None], other, base)
    v1 = jnp.cross(v2, v0)

    vecs = jnp.stack([v0, v1, v2], axis=-1)
    # isotropic: eigenvalues all q, any orthonormal basis — use identity
    iso = p2 <= (jnp.asarray(1e-12, dt) * jnp.maximum(q * q, tiny))
    vecs = jnp.where(iso[..., None, None], jnp.eye(3, dtype=dt), vecs)
    # Rayleigh-quotient polish: the trigonometric roots lose ~sqrt(eps)
    # digits near repeated eigenvalues (acos at +-1), but v^T A v is
    # exact-to-roundoff for ANY unit vector of the (possibly degenerate)
    # eigenspace — measured 1.7e-4 -> ~1e-6 relative on repeated pairs
    vals = jnp.einsum("...ji,...jk,...ki->...i", vecs, A, vecs)
    return vals, vecs
