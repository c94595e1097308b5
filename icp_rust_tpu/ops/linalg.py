"""Closed-form small linear solves, batched.

Behavioral parity with reference src/linalg.rs:3-29: adjugate/determinant
3x3 inverse whose only rank guard is the determinant test.  The reference
tests ``det == 0.0`` exactly (src/linalg.rs:18); that exact test is the
default here, with an optional relative epsilon for float32 TPU runs
(config.det_rel_eps).  Cofactor expressions mirror the reference's exact
operation order so f64 results are bit-comparable.

Option-returning semantics become an ``ok`` flag so the solve vmaps over
batches of systems (SURVEY.md §5 "failure detection": failed pairs mask to
no-op updates instead of unwinding).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def det3x3(m: Array) -> Array:
    """Determinant with the reference's exact expansion (src/linalg.rs:15-17)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    return (
        m00 * (m22 * m11 - m21 * m12)
        - m10 * (m22 * m01 - m21 * m02)
        + m20 * (m12 * m01 - m11 * m02)
    )


def adjugate3x3(m: Array) -> Array:
    """Adjugate with the reference's cofactor layout (src/linalg.rs:22-27)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    row0 = jnp.stack(
        [m22 * m11 - m21 * m12, -(m22 * m01 - m21 * m02), m12 * m01 - m11 * m02],
        axis=-1,
    )
    row1 = jnp.stack(
        [-(m22 * m10 - m20 * m12), m22 * m00 - m20 * m02, -(m12 * m00 - m10 * m02)],
        axis=-1,
    )
    row2 = jnp.stack(
        [m21 * m10 - m20 * m11, -(m21 * m00 - m20 * m01), m11 * m00 - m10 * m01],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse3x3(m: Array, det_rel_eps: float = 0.0):
    """Batched closed-form inverse; returns (inv, ok).

    ok is the reference's ``det != 0`` for det_rel_eps == 0 (exact parity),
    else ``|det| > det_rel_eps * max|m|^3`` (float32-safe).
    Where not ok, inv is zeros (callers must gate on ok).
    """
    det = det3x3(m)
    if det_rel_eps > 0.0:
        scale = jnp.max(jnp.abs(m), axis=(-1, -2))
        ok = jnp.abs(det) > det_rel_eps * scale**3
    else:
        ok = det != 0.0
    safe_det = jnp.where(ok, det, jnp.ones_like(det))
    inv = adjugate3x3(m) / safe_det[..., None, None]
    return jnp.where(ok[..., None, None], inv, jnp.zeros_like(inv)), ok


def solve3x3(a: Array, b: Array, det_rel_eps: float = 0.0):
    """Solve a x = b via the adjugate inverse; returns (x, ok)."""
    inv, ok = inverse3x3(a, det_rel_eps)
    x = jnp.einsum("...ij,...j->...i", inv, b)
    return x, ok


def sym3x3_eigh_smallest(cov: Array):
    """Eigenvalues (ascending) and the SMALLEST-eigenvalue eigenvector of
    a symmetric 3x3 (batched), in closed form.

    ``jnp.linalg.eigh`` lowers to a LAPACK-style custom call that costs
    ~13 ms for 32k tiny matrices on TPU — 40% of a whole p2l frame; this
    trigonometric form (Eberly) is pure vectorized arithmetic.  The
    eigenvector comes from the largest cross product of two rows of
    (A - lambda_0 I); for (near-)repeated smallest eigenvalues the
    direction is ill-defined and callers must gate on the eigenvalue
    ratios (the normals planarity gate already does).

    cov: (..., 3, 3) symmetric.  Returns (evals (..., 3) ascending,
    v0 (..., 3) unit-ish; [0,0,1] where fully degenerate).
    """
    dtype = cov.dtype
    a00 = cov[..., 0, 0]
    a11 = cov[..., 1, 1]
    a22 = cov[..., 2, 2]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a12 = cov[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    b00 = a00 - q
    b11 = a11 - q
    b22 = a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    safe_p = jnp.maximum(p, tiny)
    del p2  # guarded via p3 below
    # det((A - qI) / p) / 2
    detb = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    # p == 0 means A = qI (isotropic/zero): detb/(2 p^3) is 0/0 = NaN
    # there; any r gives the right answer since all eigenvalues equal q.
    p3 = safe_p**3
    iso = p3 <= tiny
    r = jnp.clip(
        jnp.where(iso, 1.0, detb) / jnp.where(iso, 1.0, 2.0 * p3),
        -1.0, 1.0,
    )
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = jnp.asarray(2.0 * jnp.pi / 3.0, dtype)
    lam2 = q + 2.0 * p * jnp.cos(phi)
    lam0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    lam1 = 3.0 * q - lam0 - lam2
    evals = jnp.stack([lam0, lam1, lam2], axis=-1)

    # Eigenvector of lam0: rows of (A - lam0 I); the two largest-norm
    # rows' cross product spans the null space.
    r0 = jnp.stack([a00 - lam0, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam0, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam0], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    norm = jnp.linalg.norm(best, axis=-1, keepdims=True)
    fallback = jnp.zeros_like(best).at[..., 2].set(1.0)
    v0 = jnp.where(norm > tiny, best / jnp.maximum(norm, tiny), fallback)
    return evals, v0
