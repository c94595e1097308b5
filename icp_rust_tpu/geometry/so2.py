"""SO(2): planar rotations, batched.

Behavioral parity with reference src/so2.rs:
- ``exp(theta)`` builds the 2x2 rotation matrix (src/so2.rs:23-31).
- ``log(R) = atan2(R[1,0], R[0,0])`` (src/so2.rs:19-21).

Rotations are plain ``(..., 2, 2)`` arrays (the reference's ``Rotation2`` is
just a checked 2x2 matrix; on TPU there is nothing to check at runtime).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def exp(theta: Array) -> Array:
    """Rotation matrix of angle ``theta``; shape (...,) -> (..., 2, 2)."""
    theta = jnp.asarray(theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def log(rot: Array) -> Array:
    """Angle of a rotation matrix; shape (..., 2, 2) -> (...,)."""
    return jnp.arctan2(rot[..., 1, 0], rot[..., 0, 0])


def identity(batch_shape=(), dtype=jnp.float32) -> Array:
    return jnp.broadcast_to(jnp.eye(2, dtype=dtype), (*batch_shape, 2, 2))
