"""Sequential scan odometry — the reference examples' end-to-end flow.

Parity with reference examples/scan2d.rs:56-115 and scan3d.rs:104-131:
frame 1 is the src kept fixed forever; each later frame becomes dst; the
estimate is warm-started from the previous transform; the trajectory is the
translation of T^-1 per frame.

The per-frame ICP call is jitted once for the padded scan shape and reused
across the sequence; frames stream through host->device transfers while the
previous step computes (XLA dispatch is async).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import icp2d, icp3d_planar
from icp_rust_tpu.utils import io as scan_io


def run_odometry(
    frames: Sequence[np.ndarray],
    config: ICPConfig = ICPConfig(),
    pad_multiple: int | None = None,
) -> Tuple[List[RigidTransform2], np.ndarray]:
    """Run scan-to-first-scan odometry over a frame sequence.

    frames: list of (N_i, 2) or (N_i, 3) arrays.  Returns (transforms,
    trajectory (F-1, 2)).  Dim 3 uses the planar 3D driver
    (3D matching / SE(2) solve), mirroring examples/scan3d.rs.
    """
    dim = frames[0].shape[1]
    pts, mask = scan_io.pad_points(
        frames, multiple=pad_multiple or config.pad_multiple
    )
    driver = icp2d if dim == 2 else icp3d_planar

    @jax.jit
    def step(src, src_mask, dst, dst_mask, t_prev: RigidTransform2):
        return driver(src, dst, src_mask, dst_mask, t_prev, config)

    dtype = config.compute_dtype
    src = jnp.asarray(pts[0], dtype)
    src_mask = jnp.asarray(mask[0])
    t = RigidTransform2.identity(dtype=dtype)
    transforms, path = [], []
    for i in range(1, len(frames)):
        t = step(src, src_mask, jnp.asarray(pts[i], dtype), jnp.asarray(mask[i]), t)
        inv = t.inverse()
        transforms.append(t)
        path.append(np.asarray(inv.t, dtype=np.float64))
    return transforms, np.asarray(path)


import functools


@functools.partial(jax.jit, static_argnames=("config",))
def _odometry_step(src, dst, src_mask, dst_mask, t, config: ICPConfig):
    """Single warm-started frame alignment + trajectory point (module-level
    so the jit cache persists across calls; a per-call closure would
    recompile every time, which is catastrophic with remote compilation)."""
    driver = icp2d if src.shape[-1] == 2 else icp3d_planar
    t = driver(src, dst, src_mask, dst_mask, t, config)
    return t, t.inverse().t


def run_odometry_device(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
):
    """Device-resident sequence odometry: all frames are uploaded once and
    every per-frame step runs from device-resident arrays, so no
    host->device data motion happens inside the loop (the TPU-native shape
    of examples/scan2d.rs's loop).  Dispatch is async; results are fetched
    once at the end.

    Note: the "scan is slower" lore from early measurements was a timing
    artifact of the remote tunnel (see docs/DESIGN.md methodology); the
    fused lax.scan runner below measures the same per-frame cost and pays
    the dispatch round trip once per SEQUENCE — prefer run_odometry_fused
    unless you need per-frame host interleaving.

    frames: (F, N, D) padded; masks: (F, N).  Frame 0 is the fixed src;
    returns (transforms list, path (F-1, 2) numpy).
    """
    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    src, src_mask = pts[0], msk[0]
    t = RigidTransform2.identity(dtype=config.compute_dtype)
    transforms, path = [], []
    for i in range(1, pts.shape[0]):
        t, pos = _odometry_step(src, pts[i], src_mask, msk[i], t, config)
        transforms.append(t)
        path.append(pos)
    path = np.asarray(jnp.stack(path))
    return transforms, path


@functools.partial(jax.jit, static_argnames=("config",))
def _odometry_scan(pts, msk, config: ICPConfig):
    driver = icp2d if pts.shape[-1] == 2 else icp3d_planar
    src, src_mask = pts[0], msk[0]
    t0 = RigidTransform2.identity(dtype=pts.dtype)

    def step(t, frame):
        dst, dst_mask = frame
        t = driver(src, dst, src_mask, dst_mask, t, config)
        return t, (t.rot, t.t, t.inverse().t)

    _, (rots, ts, path) = jax.lax.scan(step, t0, (pts[1:], msk[1:]))
    return rots, ts, path


def run_odometry_fused(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
):
    """Whole-sequence odometry as ONE compiled program (lax.scan over the
    frame axis) — a single device dispatch for the full trajectory.

    On the remote-tunnelled TPU a dispatch costs ~27 ms of round-trip
    latency; fusing the sequence pays it once instead of once per frame,
    and nothing host-side can stall the inter-frame pipeline.  Same
    semantics (scan-to-first-scan, warm start, src/lib.rs:105-130
    parity), same measured per-frame device cost as the dispatch loop.

    frames: (F, N, D) padded; masks: (F, N).  Returns (transforms, path):
    ``transforms`` is ONE batched RigidTransform2 with a leading (F-1,)
    frame axis (index it lazily: transforms.rot[i] / transforms.t[i]),
    ``path`` a (F-1, 2) numpy trajectory.
    """
    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    rots, ts, path = _odometry_scan(pts, msk, config)
    path = np.asarray(path)
    # One BATCHED transform (leading frame axis), not a per-frame list:
    # slicing rots[i]/ts[i] here would issue 2 dynamic-slice dispatches
    # per frame, which on a high-latency link costs more than the whole
    # device program.
    return RigidTransform2(rots, ts), path


def ate_rmse(path_a: np.ndarray, path_b: np.ndarray) -> float:
    """Absolute trajectory error (RMSE over per-frame position error)."""
    d = np.linalg.norm(path_a - path_b, axis=-1)
    return float(np.sqrt(np.mean(d * d)))
