"""Full-sequence 2D SLAM: batched odometry + loop closures + pose graph.

Ties the engine's configs together (BASELINE.json configs[2] and [4]):

1. **Batched multi-pair ICP**: every consecutive scan pair of the sequence
   aligns in ONE natively-batched solve (identity warm start — consecutive
   motion is small), giving the odometry chain.
2. Loop-closure candidates: pose pairs closer than ``loop_radius`` with
   index gap >= ``min_gap``; each candidate pair is verified by another
   batched ICP solve and accepted if the post-alignment mean NN distance is
   small.
3. Pose-graph GN (models.pose_graph) with Cauchy-robust loop edges.

No reference counterpart — the reference's examples do scan-to-first-scan
matching only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import pose_graph as pg
from icp_rust_tpu.models.icp2d import icp2d
from icp_rust_tpu.ops.nn import nearest_neighbor
from icp_rust_tpu.utils import io as scan_io


class SlamResult(NamedTuple):
    poses: RigidTransform2       # optimized absolute poses (P,)
    odometry_path: np.ndarray    # (P, 2) dead-reckoned positions
    optimized_path: np.ndarray   # (P, 2) after graph optimization
    n_loop_closures: int
    error_before: float
    error_after: float


def _batched_icp(src, dst, src_mask, dst_mask, config):
    import functools

    # icp2d is batch-polymorphic (batched carries/NN + the
    # pair-vectorized GN kernel on TPU) — one call, no vmap.
    fn = jax.jit(functools.partial(icp2d, config=config))
    b = src.shape[0]
    t0 = RigidTransform2.identity((b,), config.compute_dtype)
    return fn(src, dst, src_mask, dst_mask, t0)


def _mean_nn_dist(src, dst, src_mask, dst_mask, t: RigidTransform2, config):
    src_t = t.apply_points(src.astype(config.compute_dtype))
    res = nearest_neighbor(
        src_t, dst.astype(config.compute_dtype), dst_mask,
        backend=config.nn_backend, tile=config.nn_dst_tile,
        method=config.nn_method,
    )
    d = jnp.sqrt(jnp.maximum(res.dist_sq, 0.0))
    w = src_mask.astype(d.dtype)
    return jnp.sum(d * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)


def run_slam2d(
    frames,
    config: ICPConfig = ICPConfig(),
    loop_radius: float = 300.0,
    min_gap: int = 20,
    max_loop_candidates: int = 64,
    accept_factor: float = 2.0,
    graph_iters: int = 20,
) -> SlamResult:
    pts_np, mask_np = scan_io.pad_points(frames)
    pts = jnp.asarray(pts_np, config.compute_dtype)
    mask = jnp.asarray(mask_np)
    f = pts.shape[0]

    # 1. Odometry: all consecutive pairs in one batched solve.
    rel = _batched_icp(pts[:-1], pts[1:], mask[:-1], mask[1:], config)
    # rel[k] maps frame k points into frame k+1: pose_{k+1} = pose_k o rel_k^-1.
    rel_inv = rel.inverse()
    rots = [jnp.eye(2, dtype=config.compute_dtype)]
    ts = [jnp.zeros(2, dtype=config.compute_dtype)]
    for k in range(f - 1):
        prev = RigidTransform2(rots[-1], ts[-1])
        nxt = prev.compose(RigidTransform2(rel_inv.rot[k], rel_inv.t[k]))
        rots.append(nxt.rot)
        ts.append(nxt.t)
    odo_poses = RigidTransform2(jnp.stack(rots), jnp.stack(ts))
    odo_path = np.asarray(odo_poses.t, dtype=np.float64)

    # Baseline alignment quality: consecutive-pair post-ICP NN distance.
    base_nn = _mean_nn_dist(
        pts[:-1], pts[1:], mask[:-1], mask[1:], rel, config
    )
    accept_thresh = accept_factor * float(jnp.median(base_nn))

    # 2. Loop-closure candidates from odometry proximity.
    d2 = (
        (odo_path[:, None, :] - odo_path[None, :, :]) ** 2
    ).sum(-1)
    ii, jj = np.nonzero(
        (d2 < loop_radius**2)
        & (np.abs(np.arange(f)[:, None] - np.arange(f)[None, :]) >= min_gap)
    )
    keep = ii < jj
    cand = list(zip(ii[keep].tolist(), jj[keep].tolist()))
    # Thin out: keep the closest per (i // gap) bucket, cap the total.
    cand.sort(key=lambda p: d2[p[0], p[1]])
    seen_bucket = set()
    picked = []
    for i, j in cand:
        b = (i // max(min_gap // 2, 1), j // max(min_gap // 2, 1))
        if b in seen_bucket:
            continue
        seen_bucket.add(b)
        picked.append((i, j))
        if len(picked) >= max_loop_candidates:
            break

    extra_edges = []
    if picked:
        ci = np.array([p[0] for p in picked])
        cj = np.array([p[1] for p in picked])
        # Verify candidates with a batched ICP warm-started from odometry.
        init = RigidTransform2(
            jnp.asarray(
                np.stack([
                    np.asarray(odo_poses.rot[j]).T @ np.asarray(odo_poses.rot[i])
                    for i, j in picked
                ]), config.compute_dtype,
            ),
            jnp.asarray(
                np.stack([
                    np.asarray(odo_poses.rot[j]).T
                    @ (np.asarray(odo_poses.t[i]) - np.asarray(odo_poses.t[j]))
                    for i, j in picked
                ]), config.compute_dtype,
            ),
        )
        import functools

        fn = jax.jit(functools.partial(icp2d, config=config))
        t_ij = fn(pts[ci], pts[cj], mask[ci], mask[cj], init)
        nn_after = np.asarray(
            _mean_nn_dist(pts[ci], pts[cj], mask[ci], mask[cj], t_ij, config)
        )
        for k, (i, j) in enumerate(picked):
            if nn_after[k] <= accept_thresh:
                # t_ij maps frame-i points into frame j: z_ij (T_i^-1 T_j
                # convention) = t_ij^-1.
                z = RigidTransform2(
                    t_ij.rot[k], t_ij.t[k]
                ).inverse()
                extra_edges.append(
                    (i, j, z.astype(jnp.float64), 10.0 * np.eye(3))
                )

    # 3. Pose graph: chain measurements z_k = rel_inv (T_k^-1 T_{k+1}).
    chain = RigidTransform2(
        rel_inv.rot.astype(jnp.float64), rel_inv.t.astype(jnp.float64)
    )
    graph = pg.odometry_chain_graph(chain, extra_edges=extra_edges)
    e0 = float(pg.graph_error(graph))
    out = pg.optimize(
        graph, iters=graph_iters, solve="dense", huber_k=1.345,
        kernel="cauchy",
    )
    e1 = float(pg.graph_error(out))
    return SlamResult(
        poses=out.poses,
        odometry_path=odo_path,
        optimized_path=np.asarray(out.poses.t, dtype=np.float64),
        n_loop_closures=len(extra_edges),
        error_before=e0,
        error_after=e1,
    )
