"""SE(2)/SE(3) pose-graph optimization (BASELINE.json configs[4]).

No reference counterpart (SURVEY.md §7.8) — designed to extend the
reference's alignment layer to full-sequence SLAM while staying consistent
with it: the same left-multiplicative boxplus (T <- Exp(delta) o T,
reference src/lib.rs:81), the same Huber robustification on squared
residual norms (src/huber.rs), and masked fixed-shape batching throughout.

Dimension-generic: a graph over ``RigidTransform2`` poses optimizes on
SE(2) (3-DoF twists), one over ``RigidTransform3`` on SE(3) (6-DoF) — the
dispatch is on ``poses.t.shape[-1]``; every formula below is written in
terms of the twist dimension ``dof``.

Formulation
-----------
Poses T_0..T_{P-1}; edges (i, j, z_ij, info_ij) with residual

    r_e = Log(z_ij^-1 o T_i^-1 o T_j)   in R^dof.

Per-edge Jacobians wrt the local updates delta_i, delta_j are computed by
forward-mode autodiff of that expression at delta = 0 (exact, vmapped over
edges — no hand-derived block formulas to get wrong).  Gauss-Newton builds
the (dof P)x(dof P) normal equations; pose 0 is gauge-fixed with a strong
prior.

Solvers:
- ``solve="dense"``: scatter-assembled dense H, LU solve — right for
  parity-scale graphs (P up to a few thousand).
- ``solve="cg"``: matrix-free preconditioned conjugate gradients; H @ x is
  evaluated edge-wise with segment-sums (block-Jacobi preconditioner).
  This is the form that shards: edges partition across devices and the
  edge-wise products psum (parallel/dist_graph.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.ops import huber


class PoseGraph(NamedTuple):
    poses: "RigidTransform2 | RigidTransform3"  # batched (P,)
    edge_i: Array           # (E,) int32
    edge_j: Array           # (E,) int32
    meas: "RigidTransform2 | RigidTransform3"   # batched (E,) — z_ij
    info: Array             # (E, dof, dof) information matrices
    edge_mask: Array        # (E,) bool


def _group(poses):
    """(transform class, twist dof) from the pose point dimension."""
    dim = poses.t.shape[-1]
    if dim == 2:
        return RigidTransform2, 3
    if dim == 3:
        return RigidTransform3, 6
    raise ValueError(f"pose dimension must be 2 or 3, got {dim}")


def edge_residual(tcls, ti_rot, ti_t, tj_rot, tj_t, z_rot, z_t, di, dj):
    """r = Log(z^-1 (Exp(di) T_i)^-1 (Exp(dj) T_j)); all args unbatched."""
    ti = tcls(ti_rot, ti_t)
    tj = tcls(tj_rot, tj_t)
    z = tcls(z_rot, z_t)
    ti2 = tcls.from_twist(di).compose(ti)
    tj2 = tcls.from_twist(dj).compose(tj)
    rel = z.inverse().compose(ti2.inverse().compose(tj2))
    return rel.log()


def edge_residuals_and_jacobians(graph: PoseGraph):
    """Vectorized residuals (E,dof) + Jacobians (E,dof,dof)x2 at delta=0."""
    tcls, dof = _group(graph.poses)
    dtype = graph.poses.t.dtype
    ti_rot = graph.poses.rot[graph.edge_i]
    ti_t = graph.poses.t[graph.edge_i]
    tj_rot = graph.poses.rot[graph.edge_j]
    tj_t = graph.poses.t[graph.edge_j]
    zero = jnp.zeros(dof, dtype=dtype)

    def one(ti_r, ti_tt, tj_r, tj_tt, z_r, z_tt):
        f = lambda di, dj: edge_residual(
            tcls, ti_r, ti_tt, tj_r, tj_tt, z_r, z_tt, di, dj
        )
        r = f(zero, zero)
        ji = jax.jacfwd(f, argnums=0)(zero, zero)
        jj = jax.jacfwd(f, argnums=1)(zero, zero)
        return r, ji, jj

    return jax.vmap(one)(
        ti_rot, ti_t, tj_rot, tj_t, graph.meas.rot, graph.meas.t
    )


def _edge_weights(
    r: Array, info: Array, mask: Array, huber_k: float | None,
    kernel: str = "huber",
):
    """Robust IRLS weight per edge on the info-metric squared norm.

    kernel="huber": w = drho(e2, k) (reference src/huber.rs semantics) —
    downweights outliers to ~k/|r|, which still lets GROSS loop-closure
    outliers drag the graph (their weighted pull grows like |r|^0).
    kernel="cauchy": w = 1/(1 + e2/k^2) — suppresses gross outliers to
    ~k^2/e2; the standard choice for loop-closure robustness.
    """
    e2 = jnp.einsum("ek,ekl,el->e", r, info, r)
    if huber_k is None:
        w = jnp.ones_like(e2)
    elif kernel == "cauchy":
        w = 1.0 / (1.0 + e2 / (huber_k * huber_k))
    else:
        w = huber.drho(e2, huber_k)
    return w * mask.astype(r.dtype)


def graph_error(graph: PoseGraph, huber_k: float | None = None) -> Array:
    r, _, _ = edge_residuals_and_jacobians(graph)
    e2 = jnp.einsum("ek,ekl,el->e", r, graph.info, r)
    if huber_k is not None:
        e2 = huber.rho(e2, huber_k)
    return jnp.sum(e2 * graph.edge_mask.astype(r.dtype))


def _assemble_dense(graph: PoseGraph, r, ji, jj, w):
    p = graph.poses.t.shape[0]
    dof = r.shape[-1]
    dtype = r.dtype
    wi = w[:, None, None]
    # Per-edge weighted blocks.
    a_ii = wi * jnp.einsum("eki,ekl,elj->eij", ji, graph.info, ji)
    a_jj = wi * jnp.einsum("eki,ekl,elj->eij", jj, graph.info, jj)
    a_ij = wi * jnp.einsum("eki,ekl,elj->eij", ji, graph.info, jj)
    b_i = w[:, None] * jnp.einsum("eki,ekl,el->ei", ji, graph.info, r)
    b_j = w[:, None] * jnp.einsum("eki,ekl,el->ei", jj, graph.info, r)

    h = jnp.zeros((p, dof, p, dof), dtype=dtype)
    h = h.at[graph.edge_i, :, graph.edge_i, :].add(a_ii)
    h = h.at[graph.edge_j, :, graph.edge_j, :].add(a_jj)
    h = h.at[graph.edge_i, :, graph.edge_j, :].add(a_ij)
    h = h.at[graph.edge_j, :, graph.edge_i, :].add(
        jnp.swapaxes(a_ij, -1, -2)
    )
    b = jnp.zeros((p, dof), dtype=dtype)
    b = b.at[graph.edge_i].add(b_i)
    b = b.at[graph.edge_j].add(b_j)
    return h.reshape(dof * p, dof * p), b.reshape(dof * p)


def _apply_h(graph: PoseGraph, ji, jj, w, x: Array) -> Array:
    """Matrix-free H @ x, edge-wise (shardable: psum the two scatter-adds)."""
    p = graph.poses.t.shape[0]
    dof = ji.shape[-1]
    xi = x.reshape(p, dof)[graph.edge_i]
    xj = x.reshape(p, dof)[graph.edge_j]
    # y_e = info * (J_i x_i + J_j x_j), weighted
    jx = (
        jnp.einsum("ekj,ej->ek", ji, xi)
        + jnp.einsum("ekj,ej->ek", jj, xj)
    )
    y = w[:, None] * jnp.einsum("ekl,el->ek", graph.info, jx)
    out = jnp.zeros((p, dof), dtype=x.dtype)
    out = out.at[graph.edge_i].add(jnp.einsum("ekj,ek->ej", ji, y))
    out = out.at[graph.edge_j].add(jnp.einsum("ekj,ek->ej", jj, y))
    return out.reshape(dof * p)


def _block_jacobi_inv(graph: PoseGraph, ji, jj, w, gauge=None) -> Array:
    p = graph.poses.t.shape[0]
    dof = ji.shape[-1]
    wi = w[:, None, None]
    a_ii = wi * jnp.einsum("eki,ekl,elj->eij", ji, graph.info, ji)
    a_jj = wi * jnp.einsum("eki,ekl,elj->eij", jj, graph.info, jj)
    diag = jnp.zeros((p, dof, dof), dtype=w.dtype)
    diag = diag.at[graph.edge_i].add(a_ii)
    diag = diag.at[graph.edge_j].add(a_jj)
    if gauge is not None:
        # The 1e8 gauge prior MUST be in the preconditioner: without it
        # the preconditioned pose-0 modes have eigenvalues ~1e8/|H_00|,
        # CG stalls on them, and the distributed/single-device runs
        # (which differ only in psum reduction order) drift visibly.
        diag = diag + jax.vmap(jnp.diag)(gauge.reshape(p, dof))
    diag = diag + 1e-8 * jnp.eye(dof, dtype=w.dtype)
    return jnp.linalg.inv(diag)  # (P, dof, dof)


def _gauge_prior(p: int, dof: int, dtype, weight: float = 1e8):
    """Strong prior pinning pose 0 (gauge freedom)."""
    d = jnp.zeros((dof * p,), dtype=dtype)
    d = d.at[:dof].set(weight)
    return d


@functools.partial(
    jax.jit,
    static_argnames=("iters", "solve", "huber_k", "cg_iters", "kernel"),
)
def optimize(
    graph: PoseGraph,
    iters: int = 20,
    solve: str = "dense",
    huber_k: float | None = None,
    cg_iters: int = 50,
    delta_tol: float = 1e-10,
    kernel: str = "huber",
) -> PoseGraph:
    """Gauss-Newton on the pose graph; returns the graph with updated poses."""
    tcls, dof = _group(graph.poses)
    p = graph.poses.t.shape[0]
    dtype = graph.poses.t.dtype
    gauge = _gauge_prior(p, dof, dtype)

    def gn_step(carry, _):
        g, done = carry
        r, ji, jj = edge_residuals_and_jacobians(g)
        w = _edge_weights(r, g.info, g.edge_mask, huber_k, kernel)
        if solve == "dense":
            h, b = _assemble_dense(g, r, ji, jj, w)
            h = h + jnp.diag(gauge) + 1e-10 * jnp.eye(dof * p, dtype=dtype)
            delta = -jnp.linalg.solve(h, b)
        else:
            b = _apply_b(g, r, ji, jj, w)
            minv = _block_jacobi_inv(g, ji, jj, w, gauge)

            def hx(x):
                return _apply_h(g, ji, jj, w, x) + gauge * x

            def prec(x):
                return jnp.einsum(
                    "pij,pj->pi", minv, x.reshape(p, dof)
                ).reshape(dof * p)

            delta, _ = jax.scipy.sparse.linalg.cg(
                hx, -b, M=prec, maxiter=cg_iters
            )
        delta = jnp.where(done, 0.0, delta)
        dposes = delta.reshape(p, dof)
        stepped = tcls.from_twist(dposes)
        new_poses = stepped.compose(g.poses)
        new_done = done | (jnp.sum(delta * delta) < delta_tol)
        return (g._replace(poses=new_poses), new_done), None

    (out, _), _ = jax.lax.scan(
        gn_step, (graph, jnp.zeros((), bool)), None, length=iters
    )
    return out


def _apply_b(graph: PoseGraph, r, ji, jj, w) -> Array:
    p = graph.poses.t.shape[0]
    dof = r.shape[-1]
    b = jnp.zeros((p, dof), dtype=r.dtype)
    y = w[:, None] * jnp.einsum("ekl,el->ek", graph.info, r)
    b = b.at[graph.edge_i].add(jnp.einsum("ekj,ek->ej", ji, y))
    b = b.at[graph.edge_j].add(jnp.einsum("ekj,ek->ej", jj, y))
    return b.reshape(dof * p)


def odometry_chain_graph(
    transforms,
    info_scale: float = 1.0,
    extra_edges=None,
    dtype=jnp.float64,
) -> PoseGraph:
    """Build a pose graph from a chain of relative odometry transforms.

    transforms: batched (P-1,) relative motions T_{k->k+1} (pose_k frame ->
    pose_{k+1} = pose_k o T_rel ... here measurement z_ij = T_i^-1 T_j) —
    ``RigidTransform2`` or ``RigidTransform3``.
    extra_edges: list of (i, j, transform, info dofxdof) loop closures.
    """
    # Canonicalize so an f64 request degrades silently to f32 when x64 is
    # off (TPU runs) instead of emitting a truncation warning per call.
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    tcls = type(transforms)
    dim = transforms.t.shape[-1]
    dof = 3 if dim == 2 else 6
    n_rel = transforms.t.shape[0]
    p = n_rel + 1
    # Integrate the chain for the initial guess.
    ident = tcls.identity(dtype=dtype)
    poses_rot = [ident.rot]
    poses_t = [ident.t]
    for k in range(n_rel):
        prev = tcls(poses_rot[-1], poses_t[-1])
        z = tcls(transforms.rot[k], transforms.t[k])
        nxt = prev.compose(z)
        poses_rot.append(nxt.rot)
        poses_t.append(nxt.t)
    poses = tcls(jnp.stack(poses_rot), jnp.stack(poses_t))

    ei = list(range(n_rel))
    ej = list(range(1, p))
    z_rot = [transforms.rot[k] for k in range(n_rel)]
    z_t = [transforms.t[k] for k in range(n_rel)]
    infos = [info_scale * jnp.eye(dof, dtype=dtype)] * n_rel
    if extra_edges:
        for (i, j, z, info) in extra_edges:
            ei.append(i)
            ej.append(j)
            z_rot.append(z.rot.astype(dtype))
            z_t.append(z.t.astype(dtype))
            infos.append(jnp.asarray(info, dtype=dtype))
    e = len(ei)
    return PoseGraph(
        poses=poses,
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        meas=tcls(jnp.stack(z_rot), jnp.stack(z_t)),
        info=jnp.stack(infos),
        edge_mask=jnp.ones(e, bool),
    )
