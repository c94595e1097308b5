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
