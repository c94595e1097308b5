"""Full-sequence SLAM: odometry + loop closures + pose graph (2D and 3D).

Ties the engine's configs together (BASELINE.json configs[2] and [4]):

1. **Batched multi-pair ICP**: every consecutive scan pair of the sequence
   aligns in ONE natively-batched solve (identity warm start — consecutive
   motion is small), giving the odometry chain.
2. Loop-closure candidates: pose pairs closer than ``loop_radius`` with
   index gap >= ``min_gap``; each candidate pair is verified by another
   batched ICP solve and accepted if the post-alignment mean NN distance is
   small.
3. Pose-graph GN (models.pose_graph) with Cauchy-robust loop edges.

``run_slam3d`` is the SE(3) analogue: point-to-plane odometry
(models.icp_p2l, voxel-PCA normals), 3D proximity loop closures verified
the same way, and the dimension-generic pose graph on 6-DoF twists.

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


def _graph_dtype():
    """f64 for the pose-graph solve (direct solvers need it at scale; see
    models/graph_schur.py) — canonicalized so x64-off runs degrade to f32
    silently instead of warning on every astype."""
    return jax.dtypes.canonicalize_dtype(jnp.float64)


def _pack_edges(extra_edges, dof):
    """Loop-closure edges -> flat npz-able arrays (i, j, rot, t).  The
    information matrix is the constant 10*I by construction here, so it is
    not stored."""
    dim = 2 if dof == 3 else 3
    if not extra_edges:
        return {
            "edge_i": np.zeros(0, np.int64),
            "edge_j": np.zeros(0, np.int64),
            "edge_rot": np.zeros((0, dim, dim)),
            "edge_t": np.zeros((0, dim)),
        }
    return {
        "edge_i": np.asarray([e[0] for e in extra_edges], np.int64),
        "edge_j": np.asarray([e[1] for e in extra_edges], np.int64),
        "edge_rot": np.stack([np.asarray(e[2].rot) for e in extra_edges]),
        "edge_t": np.stack([np.asarray(e[2].t) for e in extra_edges]),
    }


def _unpack_edges(state, tcls, dof):
    edges = []
    ii = state["edge_i"]
    for k in range(ii.shape[0]):
        z = tcls(
            jnp.asarray(state["edge_rot"][k], _graph_dtype()),
            jnp.asarray(state["edge_t"][k], _graph_dtype()),
        )
        edges.append((int(ii[k]), int(state["edge_j"][k]), z,
                      10.0 * np.eye(dof)))
    return edges


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
    checkpoint=None,
    resume: bool = False,
) -> SlamResult:
    """``checkpoint``/``resume``: same npz phase checkpoints as
    :func:`run_slam3d` — here the odometry and loop-verification passes
    are single batched solves, so the record is written after
    verification (phase 1: relative chain + edges) and after the graph
    solve (phase 2: + optimized poses); resume skips completed phases and
    reproduces the uninterrupted result bitwise."""
    pts_np, mask_np = scan_io.pad_points(frames)
    pts = jnp.asarray(pts_np, config.compute_dtype)
    mask = jnp.asarray(mask_np)
    f = pts.shape[0]

    saved = None
    if resume and checkpoint is not None:
        st = checkpoint.restore()
        if (st is not None and "rel_rot" in st
                and int(st.get("slam_phase", 0)) >= 1
                and int(st["rel_rot"].shape[0]) == f - 1):
            saved = st

    # 1. Odometry: all consecutive pairs in one batched solve.
    if saved is not None:
        rel = RigidTransform2(
            jnp.asarray(saved["rel_rot"], config.compute_dtype),
            jnp.asarray(saved["rel_t"], config.compute_dtype),
        )
    else:
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

    def _state2(phase, extra_edges):
        return {
            "slam_phase": phase,
            "rel_rot": rel.rot, "rel_t": rel.t,
            **_pack_edges(extra_edges, 3),
        }

    if saved is not None:
        extra_edges = _unpack_edges(saved, RigidTransform2, 3)
        picked = None
    else:
        # Baseline alignment quality: consecutive post-ICP NN distance.
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
            & (np.abs(np.arange(f)[:, None] - np.arange(f)[None, :])
               >= min_gap)
        )
        keep = ii < jj
        cand = list(zip(ii[keep].tolist(), jj[keep].tolist()))
        # Thin out: keep the closest per (i // gap) bucket, cap total.
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
                    (i, j, z.astype(_graph_dtype()), 10.0 * np.eye(3))
                )
    if saved is None and checkpoint is not None:
        checkpoint.save(f - 1, _state2(1, extra_edges))

    # 3. Pose graph: chain measurements z_k = rel_inv (T_k^-1 T_{k+1}).
    gdt = _graph_dtype()
    chain = RigidTransform2(
        rel_inv.rot.astype(gdt), rel_inv.t.astype(gdt)
    )
    graph = pg.odometry_chain_graph(chain, extra_edges=extra_edges)
    e0 = float(pg.graph_error(graph))
    out = pg.optimize(
        graph, iters=graph_iters, solve="dense", huber_k=1.345,
        kernel="cauchy",
    )
    e1 = float(pg.graph_error(out))
    if checkpoint is not None:
        # SURVEY §5's pose-graph state: optimized poses + edges + cursor.
        checkpoint.save(f - 1, {
            **_state2(2, extra_edges),
            "pose_rot": np.asarray(out.poses.rot),
            "pose_t": np.asarray(out.poses.t),
        })
    return SlamResult(
        poses=out.poses,
        odometry_path=odo_path,
        optimized_path=np.asarray(out.poses.t, dtype=np.float64),
        n_loop_closures=len(extra_edges),
        error_before=e0,
        error_after=e1,
    )


class Slam3Result(NamedTuple):
    poses: "RigidTransform3"     # optimized absolute poses (P,)
    odometry_path: np.ndarray    # (P, 3) dead-reckoned positions
    optimized_path: np.ndarray   # (P, 3) after graph optimization
    n_loop_closures: int
    error_before: float
    error_after: float


def run_slam3d(
    frames,
    config: ICPConfig = ICPConfig(),
    loop_radius: float = 1.0,
    min_gap: int = 8,
    max_loop_candidates: int = 16,
    accept_factor: float = 2.0,
    graph_iters: int = 15,
    normals_voxel_size: float = 0.3,
    checkpoint=None,
    resume: bool = False,
) -> Slam3Result:
    """SE(3) SLAM: p2l odometry chain + proximity loop closures + graph.

    frames: sequence of (N_i, 3) scans (ragged ok).  Odometry runs
    consecutive point-to-plane ICP (warm-started with the previous
    relative motion); loop-closure candidates are pose pairs within
    ``loop_radius`` with index gap >= ``min_gap``, each verified by a
    warm-started p2l alignment and accepted when the post-alignment mean
    NN distance is within ``accept_factor`` x the median consecutive-pair
    distance; the SE(3) pose graph (models.pose_graph, Cauchy-robust loop
    edges) fuses both.

    ``checkpoint`` (a utils.checkpoint.SequenceCheckpointer) saves the
    SLAM state as a flat npz pytree at three granularities: every K
    frames of the odometry chain (relative transforms + warm-start
    cursor), once after loop-closure verification (edges), and once after
    the graph solve (optimized poses + edges + cursor — SURVEY §5's
    pose-graph state).  ``resume=True`` seeks past whatever phase the
    checkpoint reached; a rerun reproduces the uninterrupted result
    bitwise (the per-frame step is deterministic given (pts, t) state,
    and a stale partial-sequence phase-1 record is detected by relative-
    chain length and recomputed).
    """
    import functools

    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp_p2l import icp_point_to_plane

    pts_np, mask_np = scan_io.pad_points(frames)
    pts = jnp.asarray(pts_np, config.compute_dtype)
    mask = jnp.asarray(mask_np)
    f = pts.shape[0]

    step = jax.jit(functools.partial(
        icp_point_to_plane, config=config,
        normals_voxel_size=normals_voxel_size,
    ))

    # 1. Odometry chain: rel[k] maps frame-k points into frame k+1.
    rels = []
    t = RigidTransform3.identity(dtype=config.compute_dtype)
    start_k = 0
    saved_edges = None
    if resume and checkpoint is not None:
        st = checkpoint.restore()
        if st is not None and "rel_rot" in st:
            n_rel = int(st["rel_rot"].shape[0])
            for k in range(n_rel):
                rels.append(RigidTransform3(
                    jnp.asarray(st["rel_rot"][k], config.compute_dtype),
                    jnp.asarray(st["rel_t"][k], config.compute_dtype),
                ))
            t = RigidTransform3(
                jnp.asarray(st["t_rot"], config.compute_dtype),
                jnp.asarray(st["t_t"], config.compute_dtype),
            )
            start_k = n_rel
            # A phase-1/2 record is only complete if its chain covers the
            # whole sequence (a crash mid-odometry can leave a shorter
            # one); otherwise fall through and recompute the edges.
            if int(st.get("slam_phase", 0)) >= 1 and n_rel == f - 1:
                saved_edges = _unpack_edges(st, RigidTransform3, 6)

    def _chain_state(phase):
        return {
            "slam_phase": phase,
            "rel_rot": jnp.stack([r.rot for r in rels]),
            "rel_t": jnp.stack([r.t for r in rels]),
            "t_rot": t.rot, "t_t": t.t,
        }

    for k in range(start_k, f - 1):
        t = step(pts[k], pts[k + 1], mask[k], mask[k + 1], t)
        rels.append(t)
        if checkpoint is not None:
            checkpoint.maybe_save(k, _chain_state(0))
    rel = RigidTransform3(
        jnp.stack([r.rot for r in rels]), jnp.stack([r.t for r in rels])
    )
    rel_inv = rel.inverse()
    rots = [jnp.eye(3, dtype=config.compute_dtype)]
    ts = [jnp.zeros(3, dtype=config.compute_dtype)]
    for k in range(f - 1):
        prev = RigidTransform3(rots[-1], ts[-1])
        nxt = prev.compose(RigidTransform3(rel_inv.rot[k], rel_inv.t[k]))
        rots.append(nxt.rot)
        ts.append(nxt.t)
    odo_poses = RigidTransform3(jnp.stack(rots), jnp.stack(ts))
    odo_path = np.asarray(odo_poses.t, dtype=np.float64)

    if saved_edges is not None:
        extra_edges = saved_edges
    else:
        # Baseline alignment quality for the accept threshold.
        base_nn = np.asarray(jnp.stack([
            _mean_nn_dist(pts[k], pts[k + 1], mask[k], mask[k + 1],
                          RigidTransform3(rel.rot[k], rel.t[k]), config)
            for k in range(f - 1)
        ]))
        accept_thresh = accept_factor * float(np.median(base_nn))

        # 2. Loop-closure candidates from odometry proximity (3D).
        d2 = ((odo_path[:, None, :] - odo_path[None, :, :]) ** 2).sum(-1)
        ii, jj = np.nonzero(
            (d2 < loop_radius**2)
            & (np.abs(np.arange(f)[:, None] - np.arange(f)[None, :])
               >= min_gap)
        )
        keep = ii < jj
        cand = sorted(
            zip(ii[keep].tolist(), jj[keep].tolist()),
            key=lambda p: d2[p[0], p[1]],
        )
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
        for i, j in picked:
            # Warm start from odometry: t_ij takes frame-i points into
            # frame j.
            pj = RigidTransform3(odo_poses.rot[j], odo_poses.t[j])
            pi = RigidTransform3(odo_poses.rot[i], odo_poses.t[i])
            init = pj.inverse().compose(pi)
            t_ij = step(pts[i], pts[j], mask[i], mask[j], init)
            nn_after = float(_mean_nn_dist(
                pts[i], pts[j], mask[i], mask[j], t_ij, config
            ))
            if nn_after <= accept_thresh:
                # z_ij in the graph's T_i^-1 T_j convention = t_ij^-1.
                z = t_ij.inverse()
                extra_edges.append(
                    (i, j, z.astype(_graph_dtype()), 10.0 * np.eye(6))
                )
        if checkpoint is not None:
            checkpoint.save(
                f - 1, {**_chain_state(1), **_pack_edges(extra_edges, 6)}
            )

    # 3. SE(3) pose graph.
    gdt = _graph_dtype()
    chain = RigidTransform3(
        rel_inv.rot.astype(gdt), rel_inv.t.astype(gdt)
    )
    graph = pg.odometry_chain_graph(chain, extra_edges=extra_edges)
    e0 = float(pg.graph_error(graph))
    out = pg.optimize(
        graph, iters=graph_iters, solve="dense", huber_k=1.345,
        kernel="cauchy",
    )
    e1 = float(pg.graph_error(out))
    if checkpoint is not None:
        # SURVEY §5's pose-graph state: optimized poses + edges + cursor.
        checkpoint.save(f - 1, {
            **_chain_state(2), **_pack_edges(extra_edges, 6),
            "pose_rot": np.asarray(out.poses.rot),
            "pose_t": np.asarray(out.poses.t),
        })
    return Slam3Result(
        poses=out.poses,
        odometry_path=odo_path,
        optimized_path=np.asarray(out.poses.t, dtype=np.float64),
        n_loop_closures=len(extra_edges),
        error_before=e0,
        error_after=e1,
    )
