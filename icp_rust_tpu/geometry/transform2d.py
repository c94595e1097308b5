"""Rigid 2D transform as a batched pytree.

Behavioral parity with reference src/transform.rs:
- ``from_twist`` goes through the SE(2) exponential, so the 3-vector
  parameter is a twist, not (x, y, theta) (src/transform.rs:13-16).
- ``apply(p) = R p + t`` (src/transform.rs:22-24).
- ``inverse``: (R^T, -R^T t) (src/transform.rs:26-32).
- ``compose(a, b) = (Ra Rb, Ra tb + ta)`` (src/transform.rs:42-51).

Arbitrary leading batch dims; registered as a JAX dataclass pytree so it
flows through jit/vmap/scan/while_loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.geometry import se2, so2


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidTransform2:
    rot: Array  # (..., 2, 2)
    t: Array    # (..., 2)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "RigidTransform2":
        return RigidTransform2(
            rot=so2.identity(batch_shape, dtype),
            t=jnp.zeros((*batch_shape, 2), dtype=dtype),
        )

    @staticmethod
    def from_twist(param: Array) -> "RigidTransform2":
        rot, t = se2.calc_rt(param)
        return RigidTransform2(rot=rot, t=t)

    @staticmethod
    def from_rt(rot: Array, t: Array) -> "RigidTransform2":
        return RigidTransform2(rot=rot, t=t)

    def log(self) -> Array:
        """Twist (..., 3) such that from_twist(log()) == self."""
        m = jnp.zeros((*self.t.shape[:-1], 3, 3), dtype=self.t.dtype)
        m = m.at[..., :2, :2].set(self.rot)
        m = m.at[..., :2, 2].set(self.t)
        m = m.at[..., 2, 2].set(1.0)
        return se2.log(m)

    def apply(self, p: Array) -> Array:
        """Transform point(s); p is (..., 2) broadcasting against the batch."""
        return jnp.einsum("...ij,...j->...i", self.rot, p) + self.t

    def apply_points(self, pts: Array) -> Array:
        """Transform a point cloud (..., N, 2) by a (...)-batched transform."""
        return (
            jnp.einsum("...ij,...nj->...ni", self.rot, pts)
            + self.t[..., None, :]
        )

    def inverse(self) -> "RigidTransform2":
        rt = jnp.swapaxes(self.rot, -1, -2)
        return RigidTransform2(
            rot=rt, t=-jnp.einsum("...ij,...j->...i", rt, self.t)
        )

    def compose(self, rhs: "RigidTransform2") -> "RigidTransform2":
        """self @ rhs (apply rhs first). Ref src/transform.rs:42-51."""
        return RigidTransform2(
            rot=jnp.einsum("...ij,...jk->...ik", self.rot, rhs.rot),
            t=jnp.einsum("...ij,...j->...i", self.rot, rhs.t) + self.t,
        )

    def __matmul__(self, rhs: "RigidTransform2") -> "RigidTransform2":
        return self.compose(rhs)

    def astype(self, dtype) -> "RigidTransform2":
        return RigidTransform2(self.rot.astype(dtype), self.t.astype(dtype))

    @property
    def dtype(self):
        return self.t.dtype

    @property
    def batch_shape(self):
        return self.t.shape[:-1]
