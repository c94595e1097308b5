"""Frozen configuration for the ICP engine.

The reference has no config system at all — every parameter is a hard-coded
constant (SURVEY.md §2.5).  This dataclass is the single source of truth for
those values; ``REFERENCE_CONFIG`` reproduces the reference exactly:

- ``huber_k = 1.345``                 (reference src/lib.rs:32)
- ``mad_scale = 1.482602218505602``   (reference src/stats.rs:42, 1/PPF(0.75))
- ``inner_max_iter = 200``            (reference src/lib.rs:61)
- ``inner_delta_sq_tol = 1e-6``       (reference src/lib.rs:60,71)
- ``outer_iters = 20``                (reference examples/scan2d.rs:88)

TPU-specific fields (no reference counterpart):

- ``point_scale``: coordinates are divided by this before the solve and the
  result is rescaled back.  The robust-GN ICP problem is exactly
  scale-equivariant provided Huber's k is co-scaled (which we do), so this
  changes nothing mathematically — it keeps J^T J well-conditioned in
  float32 on data with mm-scale coordinates (scans/2d spans ±3000).
- ``compute_dtype``: float32 on TPU, float64 for CPU parity testing.
- ``det_rel_eps``: the reference's singularity guard is the exact test
  ``det == 0.0`` (src/linalg.rs:18).  In float32 a relative threshold is
  safer; 0.0 reproduces the reference's behavior.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ICPConfig:
    # Robust loss (reference src/lib.rs:32, src/huber.rs:6-26).
    huber_k: float = 1.345
    # MAD -> sigma conversion, 1/PPF(0.75) (reference src/stats.rs:42).
    mad_scale: float = 1.482602218505602

    # Inner Gauss-Newton loop (reference src/lib.rs:59-84).
    inner_max_iter: int = 200
    inner_delta_sq_tol: float = 1e-6

    # Outer ICP loop (reference src/lib.rs:105-130; examples use 20).
    outer_iters: int = 20

    # --- TPU-native knobs (no reference counterpart) ---
    compute_dtype: Any = jnp.float32
    # Divide all coordinates by this before solving (exact equivariance).
    point_scale: float = 1.0
    # Relative singularity threshold for the 3x3 solve; 0.0 = reference's
    # exact det==0 test.
    det_rel_eps: float = 0.0
    # Pad point clouds to multiples of this (TPU lane width).
    pad_multiple: int = 128
    # Correspondence search backend: "auto" | "xla" | "pallas".
    nn_backend: str = "auto"
    # Distance evaluation: "direct" (exact VPU differences) | "mxu"
    # (matmul identity, HIGHEST precision).  See ops/nn.py.
    nn_method: str = "direct"
    # NN tile sizes: nn_dst_tile is the database tile of BOTH the XLA
    # sweep and the Pallas kernel; nn_query_tile is the Pallas query
    # tile.  Defaults are the measured-best on v5e at 28800^2
    # (benchmarks/profile_nn_tiles.py / profile_overhead2.py).  The
    # round-3 survivor-list kernel prunes per (query tile, 128-pt
    # chunk), so SMALLER query tiles tighten the per-tile bound (one
    # outlier query inflates a whole tile's survivor set): 256 measured
    # 140 vs 512's 115 frames/s on the 3D headline.
    nn_query_tile: int = 256
    nn_dst_tile: int = 2048
    # Spatial pre-sort of the point clouds before correspondence search:
    # "auto" (azimuth sort whenever the pruned Pallas NN kernel is
    # active — sorting is what makes its bbox tile-pruning bite) |
    # "azimuth" (always) | "none".  Sorting permutes the point axis only;
    # the GN solve is order-invariant up to f32 reduction order, so the
    # f64/XLA parity path keeps "none" semantics by staying off TPU.
    nn_sort: str = "auto"
    # Inner GN update backend: "pallas" (single-launch fused kernel incl.
    # in-kernel radix-select sigma; taken only on TPU + f32 + unbatched,
    # reduction order differs from "xla" at f32 roundoff) | "xla" (fused
    # einsums; every platform; the bit-reproducible parity path, and the
    # automatic fallback whenever the pallas conditions don't hold).
    align_backend: str = "pallas"
    # Whole-FRAME fused kernel for small 2D scans: "auto" runs the
    # entire Icp2d::estimate call (outer loop + exact NN + inner IRLS +
    # bit-exact fixed-point exit) as ONE kernel launch whenever
    # align_backend is pallas, the scans fit VMEM (<= frame_kernel_max
    # points each) and no stats are requested — at scans/2d sizes the
    # unfused path is launch/glue-bound, not compute-bound
    # (ops/align2d_pallas._icp2d_frame_kernel).  "off" disables;
    # "interpret" forces the kernel in interpret mode (CPU tests).
    # Differs from the unfused pallas path at f32 roundoff only; the
    # align_backend="xla" parity path is unaffected.
    frame_backend: str = "auto"
    # Largest padded scan the whole-frame kernels accept.  Measured on
    # v5e compiled Mosaic: BOTH variants compile and validate at 1536
    # (tests/test_tpu_hardware.py exercises exactly this size); 2048
    # fails Mosaic compilation — the lane-padded (M, 1) VMEM columns
    # plus the unrolled (M, 128) distance blocks exceed the 16 MB
    # compile-time VMEM budget (advisor r4).
    frame_kernel_max: int = 1536

    def with_(self, **kwargs) -> "ICPConfig":
        return dataclasses.replace(self, **kwargs)


# Exact reference parameters, float64 (reference is f64 throughout,
# src/types.rs:4-5).
REFERENCE_CONFIG = ICPConfig(compute_dtype=jnp.float64)

# Default TPU preset: float32 compute; callers should set point_scale to the
# data's coordinate scale (e.g. ~3000 for scans/2d).
TPU_CONFIG = ICPConfig(compute_dtype=jnp.float32)
