"""ICP drivers and higher-level estimation models.

- ``icp2d`` / ``icp3d_planar``: parity drivers for the reference's
  Icp2d/Icp3d (src/lib.rs:91-174).
- ``batched``: vmapped multi-pair alignment (BASELINE.json configs[2]).
- ``icp_p2l``: SE(3) point-to-plane ICP with estimated normals
  (configs[1]).
- ``submap``: scan-to-submap odometry over a voxel-downsampled local map
  (configs[3]).
- ``pose_graph``: SE(2) pose-graph Gauss-Newton (configs[4]).
"""

from icp_rust_tpu.models.icp2d import icp2d, icp3d_planar

__all__ = ["icp2d", "icp3d_planar"]
