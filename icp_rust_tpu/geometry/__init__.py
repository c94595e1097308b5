"""Batched Lie-group geometry: SO(2), SE(2), SO(3), SE(3).

TPU-native counterpart of the reference's scalar nalgebra modules
(src/so2.rs, src/se2.rs, src/transform.rs): every function here operates on
arrays with arbitrary leading batch dimensions so that `vmap`/`shard_map`
over scan pairs is free, and all branching (theta -> 0, theta -> pi) is
expressed with `jnp.where` so everything stays jit-traceable.
"""

from icp_rust_tpu.geometry import se2, se3, so2, so3
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3

__all__ = ["so2", "se2", "so3", "se3", "RigidTransform2", "RigidTransform3"]
