"""Multi-chip parallelism: meshes, collectives, sharded ICP.

The reference has zero parallelism of any kind (SURVEY.md §2.3: every loop
is a sequential fold).  This package introduces the TPU-native scaling
axes for the domain:

- pair axis ("dp"): data parallelism over scan pairs — vmapped ICP sharded
  across devices.
- point axis ("sp"): the sequence-parallel analogue — each chip holds a
  slice of the point cloud; J^T J / J^T r accumulate locally and reduce
  with psum; correspondence search over a sharded destination cloud uses a
  ring ppermute pass carrying a running (best-distance, best-index) — ring
  attention with argmin in place of softmax accumulation.
"""

from icp_rust_tpu.parallel.mesh import make_mesh
from icp_rust_tpu.parallel.ring_nn import ring_nearest_neighbor
from icp_rust_tpu.parallel.sharded import (
    sharded_estimate_transform,
    sharded_icp2d,
)

__all__ = [
    "make_mesh",
    "ring_nearest_neighbor",
    "sharded_estimate_transform",
    "sharded_icp2d",
]
