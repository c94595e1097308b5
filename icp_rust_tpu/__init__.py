"""icp_rust_tpu — a TPU-native ICP scan-matching and pose-graph engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``tier4/icp_rust`` crate (reference mounted at /root/reference):
2D/3D LiDAR scan-to-scan ICP with Huber-robust, MAD-scaled Gauss-Newton
on SE(2)/SE(3), extended with batched multi-pair alignment, scan-to-submap
odometry, and distributed pose-graph optimization over TPU device meshes.

Layout
------
- ``geometry``  — batched Lie groups SO(2)/SE(2)/SO(3)/SE(3) (reference src/so2.rs,
  src/se2.rs, src/transform.rs)
- ``ops``       — robust statistics, Gauss-Newton kernels, nearest-neighbor
  correspondence search (XLA and Pallas paths) (reference src/huber.rs,
  src/stats.rs, src/linalg.rs, src/lib.rs)
- ``models``    — ICP drivers, batched ICP, submap odometry, pose graph
  (reference src/lib.rs Icp2d/Icp3d)
- ``parallel``  — mesh construction, point-sharded alignment, ring-pass NN,
  distributed graph solves (no reference counterpart: the crate is
  single-threaded; see SURVEY.md §2.3)
- ``utils``     — config, scan IO, metrics, checkpointing, profiling
- ``native``    — C++ host-side runtime: reference-faithful f64 oracle +
  KD-tree CPU baseline (the reference is 100% native Rust; this is the
  build's native analogue, exposed over ctypes)
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# TPU matmuls on f32 inputs default to one-pass bf16 — fine for neural
# nets, catastrophic for geometry: the 2x2 rotation einsums in
# apply_points/compose lose ~8 mantissa bits per frame and the odometry
# drift compounds (measured: scans/2d trajectory ATE 194mm vs 0.5mm on
# CPU with identical f32 code).  Every matmul in this engine is tiny
# (2x2/3x3 contractions), so full-f32 precision costs nothing HERE — but
# it is process-global state, so we only set it when the host application
# hasn't chosen a precision itself, and ICP_RUST_TPU_NO_PRECISION_OVERRIDE=1
# opts out entirely (then gate your own calls with
# `with jax.default_matmul_precision("highest"): ...`).
if (
    _os.environ.get("ICP_RUST_TPU_NO_PRECISION_OVERRIDE") != "1"
    and _jax.config.jax_default_matmul_precision is None
):
    _jax.config.update("jax_default_matmul_precision", "highest")

from icp_rust_tpu.config import ICPConfig, REFERENCE_CONFIG

__all__ = ["ICPConfig", "REFERENCE_CONFIG", "__version__"]
