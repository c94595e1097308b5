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
    from icp_rust_tpu.models.icp2d import presort_src

    driver = icp2d if dim == 2 else icp3d_planar

    dtype = config.compute_dtype
    # The fixed src's sort is loop-invariant — hoist it (bitwise-neutral).
    src, src_mask, presorted = presort_src(
        jnp.asarray(pts[0], dtype), jnp.asarray(mask[0]),
        jnp.asarray(pts[0], dtype), config
    )

    @jax.jit
    def step(src, src_mask, dst, dst_mask, t_prev: RigidTransform2):
        return driver(src, dst, src_mask, dst_mask, t_prev, config,
                      src_presorted=presorted)
    t = RigidTransform2.identity(dtype=dtype)
    transforms, path = [], []
    for i in range(1, len(frames)):
        t = step(src, src_mask, jnp.asarray(pts[i], dtype), jnp.asarray(mask[i]), t)
        inv = t.inverse()
        transforms.append(t)
        path.append(np.asarray(inv.t, dtype=np.float64))
    return transforms, np.asarray(path)


import functools


@functools.partial(
    jax.jit, static_argnames=("config", "with_stats", "src_presorted")
)
def _odometry_step(src, dst, src_mask, dst_mask, t, config: ICPConfig,
                   with_stats: bool = False, src_presorted: bool = False):
    """Single warm-started frame alignment + trajectory point (module-level
    so the jit cache persists across calls; a per-call closure would
    recompile every time, which is catastrophic with remote compilation)."""
    driver = icp2d if src.shape[-1] == 2 else icp3d_planar
    if with_stats:
        t, stats = driver(src, dst, src_mask, dst_mask, t, config,
                          return_stats=True, src_presorted=src_presorted)
        return t, t.inverse().t, stats
    t = driver(src, dst, src_mask, dst_mask, t, config,
               src_presorted=src_presorted)
    return t, t.inverse().t


def run_odometry_device(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
    metrics=None,
    checkpoint=None,
    resume: bool = False,
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

    ``metrics``: a utils.metrics.MetricsLogger — per-frame wall time plus
    device stats (outer iterations, final Huber error, mean NN distance,
    inlier fraction) go into one JSONL row per frame.
    ``checkpoint``: a utils.checkpoint.SequenceCheckpointer — every K
    frames the cursor + current transform + trajectory-so-far are saved
    atomically; ``resume=True`` seeks past the checkpointed cursor and
    reproduces the remaining trajectory bitwise (the engine is
    deterministic given (src, t) state).
    """
    from icp_rust_tpu.models.icp2d import presort_src

    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    # The fixed src's sort is loop-invariant — hoist it (bitwise-neutral).
    src, src_mask, presorted = presort_src(pts[0], msk[0], pts[0], config)
    t = RigidTransform2.identity(dtype=config.compute_dtype)
    transforms, path = [], []
    start = 1
    if resume and checkpoint is not None:
        state = checkpoint.restore()
        if state is not None:
            start = int(state["frame_cursor"]) + 1
            t = RigidTransform2(
                jnp.asarray(state["t_rot"], config.compute_dtype),
                jnp.asarray(state["t_t"], config.compute_dtype),
            )
            for row in state["path"]:
                path.append(jnp.asarray(row))
    with_stats = metrics is not None
    for i in range(start, pts.shape[0]):
        if metrics is not None:
            metrics.start_frame()
        out = _odometry_step(src, pts[i], src_mask, msk[i], t, config,
                             with_stats, presorted)
        if with_stats:
            t, pos, stats = out
            metrics.end_frame(
                i,
                huber_error=float(stats.huber_error),
                mean_nn_dist=float(stats.mean_nn_dist),
                inlier_fraction=float(stats.inlier_fraction),
                extra={"outer_iters": int(stats.outer_iters)},
            )
        else:
            t, pos = out
        transforms.append(t)
        path.append(pos)
        if checkpoint is not None:
            checkpoint.maybe_save(i, {
                "t_rot": t.rot, "t_t": t.t,
                "path": jnp.stack(path),
            })
    path = np.asarray(jnp.stack(path))
    return transforms, path


@functools.partial(
    jax.jit,
    static_argnames=("config", "normals_voxel", "with_stats",
                     "src_presorted"),
)
def _p2l_step(src, dst, src_mask, dst_mask, t, config: ICPConfig,
              normals_voxel: float, with_stats: bool = False,
              src_presorted: bool = False):
    """Single warm-started SE(3) point-to-plane frame alignment (module-
    level jit for the same cache-persistence reason as _odometry_step)."""
    from icp_rust_tpu.models.icp_p2l import icp_point_to_plane

    if with_stats:
        t, stats = icp_point_to_plane(
            src, dst, src_mask, dst_mask, t, config,
            normals_voxel_size=normals_voxel, return_stats=True,
            src_presorted=src_presorted,
        )
        return t, t.inverse().t, stats
    t = icp_point_to_plane(
        src, dst, src_mask, dst_mask, t, config,
        normals_voxel_size=normals_voxel, src_presorted=src_presorted,
    )
    return t, t.inverse().t


def run_odometry_p2l(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
    normals_voxel_size: float = 0.3,
    metrics=None,
    checkpoint=None,
    resume: bool = False,
):
    """Device-resident SE(3) point-to-plane sequence odometry — the full
    6-DoF counterpart of :func:`run_odometry_device` with the same
    observability surface: per-frame JSONL metrics rows (outer iterations,
    Huber error, mean NN distance, inlier fraction), every-K checkpoints,
    and bitwise kill-and-resume (the engine is deterministic given the
    (src, transform) state).

    frames: (F, N, 3) padded; masks: (F, N).  Frame 0 is the fixed src.
    Returns (transforms list of RigidTransform3, path (F-1, 3) numpy).
    """
    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp2d import presort_src

    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    # The fixed src's sort is loop-invariant — hoist it (bitwise-neutral).
    src, src_mask, presorted = presort_src(pts[0], msk[0], pts[0], config)
    t = RigidTransform3.identity(dtype=config.compute_dtype)
    transforms, path = [], []
    start = 1
    if resume and checkpoint is not None:
        state = checkpoint.restore()
        if state is not None:
            start = int(state["frame_cursor"]) + 1
            t = RigidTransform3(
                jnp.asarray(state["t_rot"], config.compute_dtype),
                jnp.asarray(state["t_t"], config.compute_dtype),
            )
            for row in state["path"]:
                path.append(jnp.asarray(row))
    with_stats = metrics is not None
    for i in range(start, pts.shape[0]):
        if metrics is not None:
            metrics.start_frame()
        out = _p2l_step(src, pts[i], src_mask, msk[i], t, config,
                        normals_voxel_size, with_stats, presorted)
        if with_stats:
            t, pos, stats = out
            metrics.end_frame(
                i,
                huber_error=float(stats.huber_error),
                mean_nn_dist=float(stats.mean_nn_dist),
                inlier_fraction=float(stats.inlier_fraction),
                extra={"outer_iters": int(stats.outer_iters)},
            )
        else:
            t, pos = out
        transforms.append(t)
        path.append(pos)
        if checkpoint is not None:
            checkpoint.maybe_save(i, {
                "t_rot": t.rot, "t_t": t.t,
                "path": jnp.stack(path),
            })
    path = np.asarray(jnp.stack(path))
    return transforms, path


@functools.partial(
    jax.jit, static_argnames=("config", "normals_voxel", "with_stats")
)
def _p2l_scan(pts, msk, config: ICPConfig, normals_voxel: float,
              with_stats: bool = False):
    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp2d import presort_src
    from icp_rust_tpu.models.icp_p2l import icp_point_to_plane

    # Hoist the fixed src's loop-invariant sort (see _odometry_scan).
    src, src_mask, presorted = presort_src(pts[0], msk[0], pts[0], config)
    t0 = RigidTransform3.identity(dtype=pts.dtype)

    def step(t, frame):
        dst, dst_mask = frame
        if with_stats:
            t, st = icp_point_to_plane(
                src, dst, src_mask, dst_mask, t, config,
                normals_voxel_size=normals_voxel, return_stats=True,
                src_presorted=presorted,
            )
            return t, (t.rot, t.t, t.inverse().t, st)
        t = icp_point_to_plane(
            src, dst, src_mask, dst_mask, t, config,
            normals_voxel_size=normals_voxel, src_presorted=presorted,
        )
        return t, (t.rot, t.t, t.inverse().t)

    _, out = jax.lax.scan(step, t0, (pts[1:], msk[1:]))
    return out


def run_odometry_p2l_fused(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
    normals_voxel_size: float = 0.3,
    with_metrics: bool = False,
):
    """Whole-sequence SE(3) point-to-plane odometry as ONE compiled
    program (lax.scan over frames; per-frame voxel-PCA normals computed
    inside the scan body) — the p2l analogue of
    :func:`run_odometry_fused`: a single device dispatch for the full
    trajectory instead of one ~27 ms tunnel round trip per frame.

    frames: (F, N, 3) padded; masks: (F, N).  Returns (transforms, path)
    where ``transforms`` is ONE batched RigidTransform3 with a leading
    (F-1,) frame axis and ``path`` a (F-1, 3) numpy trajectory; with
    ``with_metrics`` the per-frame ICPStats arrays ride along as a third
    element.  For per-frame checkpoints/JSONL metrics use
    :func:`run_odometry_p2l` (the dispatch loop) instead.
    """
    from icp_rust_tpu.geometry.transform3d import RigidTransform3

    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    if with_metrics:
        rots, ts, path, stats = _p2l_scan(
            pts, msk, config, float(normals_voxel_size), True
        )
        return RigidTransform3(rots, ts), np.asarray(path), stats
    rots, ts, path = _p2l_scan(
        pts, msk, config, float(normals_voxel_size)
    )
    return RigidTransform3(rots, ts), np.asarray(path)


@functools.partial(jax.jit, static_argnames=("config", "with_stats"))
def _odometry_scan(pts, msk, config: ICPConfig, with_stats: bool = False):
    from icp_rust_tpu.models.icp2d import presort_src

    driver = icp2d if pts.shape[-1] == 2 else icp3d_planar
    # Frame 0 is the fixed src for the whole sequence; hoist its Morton
    # sort out of the scan body (XLA does not hoist sorts out of while
    # loops — the round-3 trace showed a redundant per-frame argsort).
    # Bitwise-identical: presort_src applies the drivers' own permutation.
    src, src_mask, presorted = presort_src(pts[0], msk[0], pts[0], config)
    t0 = RigidTransform2.identity(dtype=pts.dtype)

    def step(t, frame):
        dst, dst_mask = frame
        if with_stats:
            t, stats = driver(src, dst, src_mask, dst_mask, t, config,
                              return_stats=True, src_presorted=presorted)
            return t, (t.rot, t.t, t.inverse().t, stats)
        t = driver(src, dst, src_mask, dst_mask, t, config,
                   src_presorted=presorted)
        return t, (t.rot, t.t, t.inverse().t)

    _, out = jax.lax.scan(step, t0, (pts[1:], msk[1:]))
    if with_stats:
        rots, ts, path, stats = out
        return rots, ts, path, stats
    rots, ts, path = out
    return rots, ts, path


def run_odometry_fused(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
    with_metrics: bool = False,
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

    With ``with_metrics`` the scan additionally emits per-frame device
    stats (outer iterations, final Huber error, mean NN distance, inlier
    fraction — models.icp2d.ICPStats arrays with a leading frame axis)
    and the return becomes (transforms, path, stats).
    """
    pts = jnp.asarray(frames, config.compute_dtype)
    msk = jnp.asarray(masks)
    if with_metrics:
        rots, ts, path, stats = _odometry_scan(pts, msk, config, True)
        return RigidTransform2(rots, ts), np.asarray(path), stats
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
