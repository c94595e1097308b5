"""Rigid 3D transform pytree; mirrors transform2d.RigidTransform2."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.geometry import se3, so3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RigidTransform3:
    rot: Array  # (..., 3, 3)
    t: Array    # (..., 3)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "RigidTransform3":
        return RigidTransform3(
            rot=so3.identity(batch_shape, dtype),
            t=jnp.zeros((*batch_shape, 3), dtype=dtype),
        )

    @staticmethod
    def from_twist(param: Array) -> "RigidTransform3":
        rot, t = se3.calc_rt(param)
        return RigidTransform3(rot=rot, t=t)

    @staticmethod
    def from_rt(rot: Array, t: Array) -> "RigidTransform3":
        return RigidTransform3(rot=rot, t=t)

    def log(self) -> Array:
        return se3.log_rt(self.rot, self.t)

    def apply(self, p: Array) -> Array:
        return jnp.einsum("...ij,...j->...i", self.rot, p) + self.t

    def apply_points(self, pts: Array) -> Array:
        return (
            jnp.einsum("...ij,...nj->...ni", self.rot, pts)
            + self.t[..., None, :]
        )

    def inverse(self) -> "RigidTransform3":
        rt = jnp.swapaxes(self.rot, -1, -2)
        return RigidTransform3(
            rot=rt, t=-jnp.einsum("...ij,...j->...i", rt, self.t)
        )

    def compose(self, rhs: "RigidTransform3") -> "RigidTransform3":
        return RigidTransform3(
            rot=jnp.einsum("...ij,...jk->...ik", self.rot, rhs.rot),
            t=jnp.einsum("...ij,...j->...i", self.rot, rhs.t) + self.t,
        )

    def __matmul__(self, rhs: "RigidTransform3") -> "RigidTransform3":
        return self.compose(rhs)

    def astype(self, dtype) -> "RigidTransform3":
        return RigidTransform3(self.rot.astype(dtype), self.t.astype(dtype))

    @property
    def dtype(self):
        return self.t.dtype

    @property
    def batch_shape(self):
        return self.t.shape[:-1]
