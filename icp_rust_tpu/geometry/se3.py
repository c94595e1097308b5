"""SE(3): rigid spatial motions as twists (v, w), batched.

No reference counterpart (see so3.py).  Twist layout: param[..., :3] = v
(translational part, through the V matrix), param[..., 3:] = w (rotation
axis-angle) — the same "translation goes through V" convention as the SE(2)
module and the reference's Transform::new (src/transform.rs:13-16).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.geometry import so3


def _small(dtype) -> float:
    return float(jnp.finfo(dtype).eps) ** 0.25


def _v_matrix(w: Array) -> Array:
    """Left Jacobian V: t = V v in exp. V = I + B K + C K^2."""
    dtype = jnp.result_type(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _small(dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe = jnp.sqrt(safe2)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(safe)) / safe2)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (safe - jnp.sin(safe)) / (safe2 * safe)
    )
    k = so3.hat(w)
    k2 = jnp.einsum("...ij,...jk->...ik", k, k)
    eye = jnp.eye(3, dtype=dtype)
    return eye + b[..., None, None] * k + c[..., None, None] * k2


def _v_inverse(w: Array) -> Array:
    """V^-1 = I - K/2 + D K^2, D = (1 - A/(2B)) / theta^2."""
    dtype = jnp.result_type(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2)
    small = theta < _small(dtype)
    safe2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    safe = jnp.sqrt(safe2)
    a = jnp.sin(safe) / safe
    b = (1.0 - jnp.cos(safe)) / safe2
    d_generic = (1.0 - a / (2.0 * b)) / safe2
    d = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0, d_generic)
    k = so3.hat(w)
    k2 = jnp.einsum("...ij,...jk->...ik", k, k)
    eye = jnp.eye(3, dtype=dtype)
    return eye - 0.5 * k + d[..., None, None] * k2


def calc_rt(param: Array):
    """Twist (..., 6) -> (rot (..., 3, 3), t (..., 3))."""
    if param.shape[-1] != 6:
        raise ValueError(
            f"SE(3) twist must have trailing dim 6, got shape {param.shape}"
        )
    v, w = param[..., :3], param[..., 3:]
    rot = so3.exp(w)
    t = jnp.einsum("...ij,...j->...i", _v_matrix(w), v)
    return rot, t


def exp(param: Array) -> Array:
    """Twist (..., 6) -> homogeneous (..., 4, 4)."""
    rot, t = calc_rt(param)
    batch = param.shape[:-1]
    m = jnp.zeros((*batch, 4, 4), dtype=param.dtype)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def log(matrix: Array) -> Array:
    """Homogeneous (..., 4, 4) -> twist (..., 6)."""
    rot, t = matrix[..., :3, :3], matrix[..., :3, 3]
    w = so3.log(rot)
    v = jnp.einsum("...ij,...j->...i", _v_inverse(w), t)
    return jnp.concatenate([v, w], axis=-1)


def log_rt(rot: Array, t: Array) -> Array:
    """(rot, t) -> twist (..., 6) without building the 4x4."""
    w = so3.log(rot)
    v = jnp.einsum("...ij,...j->...i", _v_inverse(w), t)
    return jnp.concatenate([v, w], axis=-1)
