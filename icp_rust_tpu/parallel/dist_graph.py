"""Distributed pose-graph Gauss-Newton: edges sharded across the mesh.

The distributed normal-equations reduction promised by the north star
(BASELINE.json): poses are replicated (they are tiny — 3 or 6 DoF each),
edges partition across devices, and every H @ x / J^T r contraction is a
local edge-wise product followed by a ``psum``.  CG iterations run
replicated on identical data, so all devices stay in lockstep without any
further synchronization.

Dimension-generic like models/pose_graph.py: SE(2) and SE(3) graphs both
shard the same way (the twist dof rides along in the block shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P

from icp_rust_tpu.models import pose_graph as pg


def _pad_edges(graph: pg.PoseGraph, multiple: int) -> pg.PoseGraph:
    e = graph.edge_i.shape[0]
    target = -(-e // multiple) * multiple
    if target == e:
        return graph
    pad = target - e
    tcls, dof = pg._group(graph.poses)
    dim = graph.poses.t.shape[-1]
    dtype = graph.poses.t.dtype
    return pg.PoseGraph(
        poses=graph.poses,
        edge_i=jnp.concatenate(
            [graph.edge_i, jnp.zeros(pad, jnp.int32)]
        ),
        edge_j=jnp.concatenate(
            [graph.edge_j, jnp.ones(pad, jnp.int32)]
        ),
        meas=tcls(
            jnp.concatenate(
                [graph.meas.rot,
                 jnp.broadcast_to(jnp.eye(dim, dtype=dtype),
                                  (pad, dim, dim))]
            ),
            jnp.concatenate([graph.meas.t, jnp.zeros((pad, dim), dtype)]),
        ),
        info=jnp.concatenate(
            [graph.info,
             jnp.broadcast_to(jnp.eye(dof, dtype=dtype), (pad, dof, dof))]
        ),
        edge_mask=jnp.concatenate([graph.edge_mask, jnp.zeros(pad, bool)]),
    )


def optimize_distributed(
    graph: pg.PoseGraph,
    mesh: Mesh,
    iters: int = 20,
    cg_iters: int = 50,
    huber_k: float | None = None,
    kernel: str = "huber",
    edge_axis: str = "dp",
    delta_tol: float = 1e-10,
) -> pg.PoseGraph:
    """Edge-sharded GN+CG over ``mesh``; result matches the single-device
    ``pose_graph.optimize(..., solve="cg")`` to fp accuracy."""
    n_dev = mesh.shape[edge_axis]
    graph = _pad_edges(graph, n_dev)
    tcls, dof = pg._group(graph.poses)
    p = graph.poses.t.shape[0]
    dtype = graph.poses.t.dtype
    gauge = pg._gauge_prior(p, dof, dtype)

    def local(poses_rot, poses_t, ei, ej, z_rot, z_t, info, emask):
        g = pg.PoseGraph(
            poses=tcls(poses_rot, poses_t),
            edge_i=ei, edge_j=ej,
            meas=tcls(z_rot, z_t),
            info=info, edge_mask=emask,
        )

        def gn_step(carry, _):
            g_loc, done = carry
            r, ji, jj = pg.edge_residuals_and_jacobians(g_loc)
            w = pg._edge_weights(r, g_loc.info, g_loc.edge_mask, huber_k,
                                 kernel)
            b = jax.lax.psum(pg._apply_b(g_loc, r, ji, jj, w), edge_axis)
            diag_blocks = jax.lax.psum(
                _local_diag(g_loc, ji, jj, w, p), edge_axis
            )
            # Gauge prior in the preconditioner too (see
            # pose_graph._block_jacobi_inv) — identical on all devices.
            minv = jnp.linalg.inv(
                diag_blocks
                + jax.vmap(jnp.diag)(gauge.reshape(p, dof))
                + 1e-8 * jnp.eye(dof, dtype=dtype)
            )

            def hx(x):
                return (
                    jax.lax.psum(
                        pg._apply_h(g_loc, ji, jj, w, x), edge_axis
                    )
                    + gauge * x
                )

            def prec(x):
                return jnp.einsum(
                    "pij,pj->pi", minv, x.reshape(p, dof)
                ).reshape(dof * p)

            delta, _ = jax.scipy.sparse.linalg.cg(
                hx, -b, M=prec, maxiter=cg_iters
            )
            # Identical on every device (replicated inputs, deterministic
            # CG), so the early exit stays in lockstep without a psum.
            delta = jnp.where(done, 0.0, delta)
            stepped = tcls.from_twist(delta.reshape(p, dof))
            done = done | (jnp.sum(delta * delta) < delta_tol)
            return (
                g_loc._replace(poses=stepped.compose(g_loc.poses)),
                done,
            ), None

        (g_out, _), _ = jax.lax.scan(
            gn_step, (g, jnp.zeros((), bool)), None, length=iters
        )
        return g_out.poses.rot, g_out.poses.t

    spec_e = P(edge_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), spec_e, spec_e, spec_e, spec_e, spec_e, spec_e),
        out_specs=(P(), P()),
        check_vma=False,
    )
    rot, t = fn(
        graph.poses.rot, graph.poses.t, graph.edge_i, graph.edge_j,
        graph.meas.rot, graph.meas.t, graph.info, graph.edge_mask,
    )
    return graph._replace(poses=tcls(rot, t))


def _local_diag(g: pg.PoseGraph, ji, jj, w, p: int) -> Array:
    dof = ji.shape[-1]
    wi = w[:, None, None]
    a_ii = wi * jnp.einsum("eki,ekl,elj->eij", ji, g.info, ji)
    a_jj = wi * jnp.einsum("eki,ekl,elj->eij", jj, g.info, jj)
    diag = jnp.zeros((p, dof, dof), dtype=w.dtype)
    diag = diag.at[g.edge_i].add(a_ii)
    diag = diag.at[g.edge_j].add(a_jj)
    return diag
