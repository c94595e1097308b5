"""Numeric kernels: robust loss, masked statistics, small solves, GN steps,
and nearest-neighbor correspondence search.

TPU-native counterparts of reference src/huber.rs, src/stats.rs,
src/linalg.rs and the solver core of src/lib.rs, plus the KD-tree
replacement (tiled brute-force / Pallas argmin; SURVEY.md §2.2).
"""

from icp_rust_tpu.ops import align2d, huber, linalg, nn, robust

__all__ = ["huber", "robust", "linalg", "align2d", "nn"]
