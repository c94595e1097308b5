"""SO(3): spatial rotations, batched.

No reference counterpart — the reference optimizes only SE(2) (its 3D ICP
projects to the xy-plane, src/lib.rs:146-174).  SO(3)/SE(3) are required by
the build's 3D point-to-plane config (BASELINE.json configs[1]).

Conventions match the SE(2) module: exp/log with `jnp.where`-based
small-angle Taylor branches so everything is jit-traceable and f32-stable.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _small(dtype) -> float:
    return float(jnp.finfo(dtype).eps) ** 0.25


def hat(w: Array) -> Array:
    """(..., 3) -> skew-symmetric (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(m: Array) -> Array:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1
    )


def exp(w: Array) -> Array:
    """Rodrigues: axis-angle (..., 3) -> rotation (..., 3, 3)."""
    dtype = jnp.result_type(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _small(dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe = jnp.sqrt(safe2)
    # A = sin(t)/t, B = (1-cos(t))/t^2 with Taylor fallbacks.
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / safe2)
    k = hat(w)
    k2 = jnp.einsum("...ij,...jk->...ik", k, k)
    eye = jnp.eye(3, dtype=dtype)
    return eye + a[..., None, None] * k + b[..., None, None] * k2


def log(rot: Array) -> Array:
    """Rotation (..., 3, 3) -> axis-angle (..., 3).

    Three regimes: generic (theta/(2 sin theta) * vee(R - R^T)), small-angle
    Taylor, and near-pi (axis from the diagonal of R + I, sign from the
    skew part).
    """
    dtype = jnp.result_type(rot)
    tr = rot[..., 0, 0] + rot[..., 1, 1] + rot[..., 2, 2]
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    skew = vee(rot - jnp.swapaxes(rot, -1, -2))  # = 2 sin(theta) * axis

    small = theta < _small(dtype)
    near_pi = theta > jnp.pi - 1e-3
    sin_t = jnp.sin(theta)
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_t), sin_t)
    generic = (theta / (2.0 * safe_sin))[..., None] * skew
    # Taylor branch: theta^2 must NOT come from arccos — d(arccos)/dc is
    # -1/sqrt(1-c^2) = -inf at c=1, so any use of `theta` here would make
    # jacfwd(log) NaN at the identity (exactly where pose-graph edge
    # Jacobians are evaluated: a chain edge at its own measurement has
    # rel == I bitwise).  3 - tr = theta^2 + O(theta^4) is polynomial in
    # rot; the O(theta^4) slack is below eps at the branch threshold.
    t2 = jnp.clip(3.0 - tr, 0.0, None)
    taylor = 0.5 * (1.0 + t2[..., None] / 12.0) * skew

    # Near pi: R = I + 2 axis axis^T - ... -> axis_i^2 = (R_ii + 1)/2.
    diag = jnp.stack(
        [rot[..., 0, 0], rot[..., 1, 1], rot[..., 2, 2]], axis=-1
    )
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, None))
    # Recover relative signs from the symmetric off-diagonals, anchored on
    # the largest-magnitude component.
    sym01 = rot[..., 0, 1] + rot[..., 1, 0]
    sym02 = rot[..., 0, 2] + rot[..., 2, 0]
    sym12 = rot[..., 1, 2] + rot[..., 2, 1]
    imax = jnp.argmax(axis_abs, axis=-1)
    sx, sy, sz = axis_abs[..., 0], axis_abs[..., 1], axis_abs[..., 2]
    # For anchor k, sign_j = sign(sym_kj) relative to sign_k = +1.
    ax0 = jnp.stack([sx, jnp.copysign(sy, sym01), jnp.copysign(sz, sym02)], -1)
    ax1 = jnp.stack([jnp.copysign(sx, sym01), sy, jnp.copysign(sz, sym12)], -1)
    ax2 = jnp.stack([jnp.copysign(sx, sym02), jnp.copysign(sy, sym12), sz], -1)
    axis_pi = jnp.where(
        (imax == 0)[..., None], ax0, jnp.where((imax == 1)[..., None], ax1, ax2)
    )
    # Fix overall sign using the skew part (zero exactly at pi, where the
    # sign is a gauge choice).
    dot = jnp.sum(axis_pi * skew, axis=-1, keepdims=True)
    axis_pi = jnp.where(dot < 0, -axis_pi, axis_pi)
    pi_branch = theta[..., None] * axis_pi

    out = jnp.where(small[..., None], taylor, generic)
    return jnp.where(near_pi[..., None], pi_branch, out)


def identity(batch_shape=(), dtype=jnp.float32) -> Array:
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
