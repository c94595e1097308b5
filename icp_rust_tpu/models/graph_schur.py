"""Chain-elimination Schur-complement solver for odometry pose graphs.

SLAM graphs built from odometry are a long chain (poses 0..P-1, edges
(k, k+1)) plus a handful of loop-closure edges.  Per Gauss-Newton
iteration the normal equations H delta = -b are solved EXACTLY by
variable elimination:

1. **Skeleton** = pose 0 + every loop-closure endpoint + pose P-1.  The
   interior chain poses between consecutive skeleton nodes form
   independent SEGMENTS whose H-blocks are block-tridiagonal.
2. **Forward elimination** (block Thomas) of each segment folds its
   blocks onto the two bounding skeleton nodes — a ``lax.scan`` along the
   segment, ``vmap``-ed across segments (the TPU shape: all segments
   eliminate in parallel, each as a compiler-friendly scan of small
   dof x dof solves).
3. The reduced **skeleton system** (|S| x |S| blocks, |S| ~ 2 x loops) is
   solved densely with the gauge prior on pose 0.
4. **Back-substitution** (reverse scan per segment) recovers the
   interior updates.

The eliminated system is the EXACT Schur complement of the full normal
equations — the per-iteration delta equals the dense LU solve's to
floating-point roundoff (tests/test_graph_schur.py), while the
sequential work drops from O((dof P)^3) dense / O(E) per CG iteration
x ~50 iterations to one O(max_segment) scan.

Precision: a pose chain's normal equations have condition ~O(P^2)
(lambda_min ~ 1/P^2 for the free chain), so at P ~ 2048 the system sits
at 1/eps_f32 — NO f32 direct method is accurate there (dense f32 LU
measured ~50% component error on the same graph; forming the Schur
complement explicitly is somewhat worse).  Use f64 graphs (the SLAM
pipelines build f64 graphs) or ``pg.optimize(solve="cg")`` — PCG
re-evaluates residuals each iteration and is robust in f32.  In f64 the
solver is exact at any tested size.

Segment structure depends on the VALUES of the edge lists, so it is
computed host-side once per graph (`_structure`); the numerical solver
is jitted with that structure static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from icp_rust_tpu.models import pose_graph as pg


def _structure(graph: pg.PoseGraph, seg_cap: int = 64):
    """Host-side segment layout as INDEX ARRAYS (everything downstream is
    vectorized gathers/scatters — per-element .at[] updates at trace time
    would make tracing O(P), measured minutes at 2048 poses).

    Requires the odometry-chain convention of ``pg.odometry_chain_graph``:
    edge k < P-1 is (k, k+1); later edges are loop closures.

    ``seg_cap`` bounds segment length by inserting EXTRA skeleton nodes
    every seg_cap poses (nested dissection): the elimination stays exact
    under any ordering, but a 475-pose f32 chain loses ~2 digits to the
    chain system's O(L^2) conditioning (measured 18x delta error at
    2048 poses / 8 loops), while <=64-pose segments are f32-safe — and
    shorter scans are faster on TPU anyway."""
    p = int(graph.poses.t.shape[0])
    ei = np.asarray(graph.edge_i)
    ej = np.asarray(graph.edge_j)
    n_chain = p - 1
    if not (np.all(ei[:n_chain] == np.arange(n_chain))
            and np.all(ej[:n_chain] == np.arange(1, p))):
        raise ValueError(
            "graph_schur requires odometry_chain_graph layout "
            "(edges 0..P-2 = the chain)"
        )
    loop_edges = np.arange(n_chain, len(ei))
    base = sorted({0, p - 1} | set(ei[loop_edges].tolist())
                  | set(ej[loop_edges].tolist()))
    skel = set(base)
    for a, b in zip(base[:-1], base[1:]):
        skel.update(range(a + seg_cap, b, seg_cap))
    skel = sorted(skel)
    sidx = {q: i for i, q in enumerate(skel)}
    nseg = len(skel) - 1
    seg_a = np.asarray(skel[:-1], np.int32)
    seg_b = np.asarray(skel[1:], np.int32)
    n_int = seg_b - seg_a - 1
    max_len = int(n_int.max()) if nseg else 0
    ll = max(max_len, 1)
    t_idx = np.arange(ll)[None, :]
    valid = t_idx < n_int[:, None]                      # (nseg, L)
    seg_pose = np.where(valid, seg_a[:, None] + 1 + t_idx, 1)
    u_mask = t_idx < (n_int[:, None] - 1)
    seg_last_edge = np.where(n_int > 0, seg_a + n_int, seg_a)  # edge idx
    inner_pose = np.where(u_mask, seg_pose, p)          # p = slack row
    last_pose = np.where(n_int > 0, seg_a + n_int, p)
    return {
        "p": p, "skel": np.asarray(skel, np.int32),
        "ia": np.asarray([sidx[a] for a in seg_a], np.int32),
        "ib": np.asarray([sidx[b] for b in seg_b], np.int32),
        "seg_a": seg_a, "seg_last_edge": seg_last_edge,
        "has_int": n_int > 0, "n_int": n_int,
        "seg_pose": seg_pose.astype(np.int32), "valid": valid,
        "u_mask": u_mask, "inner_pose": inner_pose.astype(np.int32),
        "last_pose": last_pose.astype(np.int32),
        "max_len": max_len, "nseg": nseg,
        "loop_e": loop_edges.astype(np.int32),
        "loop_ia": np.asarray([sidx[int(ei[e])] for e in loop_edges],
                              np.int32),
        "loop_ib": np.asarray([sidx[int(ej[e])] for e in loop_edges],
                              np.int32),
    }


def _edge_blocks(graph: pg.PoseGraph, r, ji, jj, w):
    """Weighted per-edge H/b blocks (as in pg._assemble_dense)."""
    wi = w[:, None, None]
    a_ii = wi * jnp.einsum("eki,ekl,elj->eij", ji, graph.info, ji)
    a_jj = wi * jnp.einsum("eki,ekl,elj->eij", jj, graph.info, jj)
    a_ij = wi * jnp.einsum("eki,ekl,elj->eij", ji, graph.info, jj)
    b_i = w[:, None] * jnp.einsum("eki,ekl,el->ei", ji, graph.info, r)
    b_j = w[:, None] * jnp.einsum("eki,ekl,el->ei", jj, graph.info, r)
    return a_ii, a_jj, a_ij, b_i, b_j


def _solve_delta(graph, r, ji, jj, w, st, mesh=None, seg_axis="dp"):
    """Exact H delta = -b via chain elimination; returns delta (P, dof).

    With ``mesh``, segments shard over ``seg_axis`` (shard_map): each
    device eliminates its segments and the skeleton system psums — the
    distributed Schur-complement reduction of SURVEY §2.3.  The skeleton
    solve runs replicated (it is tiny); back-substitution is local.
    """
    dof = r.shape[-1]
    blocks = _edge_blocks(graph, r, ji, jj, w)
    consts = dict(
        p=st["p"], ns=len(st["skel"]),
        skel=jnp.asarray(st["skel"]),
        loop_e=jnp.asarray(st["loop_e"]),
        loop_ia=jnp.asarray(st["loop_ia"]),
        loop_ib=jnp.asarray(st["loop_ib"]),
        n_loops=len(st["loop_e"]),
    )
    seg = dict(
        sp=jnp.asarray(st["seg_pose"]),
        valid=jnp.asarray(st["valid"]),
        u_mask=jnp.asarray(st["u_mask"]),
        seg_a=jnp.asarray(st["seg_a"]),
        seg_e=jnp.asarray(st["seg_last_edge"]),
        has=jnp.asarray(st["has_int"]),
        ia=jnp.asarray(st["ia"]),
        ib=jnp.asarray(st["ib"]),
        inner_pose=jnp.asarray(st["inner_pose"])[:, :-1],
        last_pose=jnp.asarray(st["last_pose"]),
        segv=jnp.ones((st["nseg"],), bool),
    )
    if mesh is None:
        return _solve_delta_local(blocks, seg, consts, dof, None, None)

    from jax.sharding import PartitionSpec as P

    n_dev = mesh.shape[seg_axis]
    nseg = st["nseg"]
    pad = -(-nseg // n_dev) * n_dev - nseg
    if pad:
        # Padded segments contribute NOTHING (segv False masks them).
        def padseg(x, fill=0):
            return jnp.concatenate(
                [x, jnp.full((pad, *x.shape[1:]), fill, x.dtype)]
            )

        seg = dict(
            sp=padseg(seg["sp"], 1), valid=padseg(seg["valid"], False),
            u_mask=padseg(seg["u_mask"], False),
            seg_a=padseg(seg["seg_a"]), seg_e=padseg(seg["seg_e"]),
            has=padseg(seg["has"], False), ia=padseg(seg["ia"]),
            ib=padseg(seg["ib"]),
            inner_pose=padseg(seg["inner_pose"], consts["p"]),
            last_pose=padseg(seg["last_pose"], consts["p"]),
            segv=padseg(seg["segv"], False),
        )
    keys = sorted(seg)
    fn = jax.shard_map(
        lambda blk, *seg_vals: _solve_delta_local(
            blk, dict(zip(keys, seg_vals)), consts, dof, seg_axis, None
        ),
        mesh=mesh,
        in_specs=(P(),) + tuple(P(seg_axis) for _ in keys),
        out_specs=P(),
        check_vma=False,
    )
    return fn(blocks, *(seg[k] for k in keys))


def _solve_delta_local(blocks, seg, consts, dof, axis_name, _unused):
    a_ii, a_jj, a_ij, b_i, b_j = blocks
    p = consts["p"]
    ns = consts["ns"]
    dtype = a_ii.dtype
    eye = jnp.eye(dof, dtype=dtype)

    # Interior pose k has diagonal D = a_jj[k-1] + a_ii[k]; coupling to
    # pose k+1 is U = a_ij[k].  All (nseg_local, L, ...) via gathers.
    sp = seg["sp"]
    validj = seg["valid"]
    u_maskj = seg["u_mask"]
    d_blk = jnp.where(validj[..., None, None],
                      a_jj[sp - 1] + a_ii[sp], eye)
    rhs = jnp.where(validj[..., None], -(b_j[sp - 1] + b_i[sp]), 0.0)
    u_blk = jnp.where(u_maskj[..., None, None], a_ij[sp], 0.0)
    seg_a = seg["seg_a"]
    seg_e = seg["seg_e"]
    hasj = seg["has"]
    segv = seg["segv"]
    lcpl = jnp.where(hasj[:, None, None],
                     jnp.swapaxes(a_ij[seg_a], -1, -2), 0.0)
    rcpl = jnp.where(hasj[:, None, None], a_ij[seg_e], 0.0)

    def eliminate(d_seg, u_seg, b_seg, l0, v_seg):
        """Forward Thomas over one segment.  Carries the propagated
        pivot/coupling/rhs; stacks per-step P_k^-1-applied quantities for
        back-substitution and accumulates skeleton (L,L) fill-in."""

        def step(carry, x):
            dprev, cprev, bprev, hll, bl = carry
            d_k, u_k, b_k, v = x
            pinv = jnp.linalg.inv(dprev)
            pu = pinv @ u_k
            pc = pinv @ cprev
            pb = pinv @ bprev
            hll_n = hll - cprev.T @ pc
            bl_n = bl - cprev.T @ pb
            d_next = d_k - u_k.T @ pu
            c_next = -u_k.T @ pc
            b_next = b_k - u_k.T @ pb
            # Masked lanes pass everything through untouched (the PREV
            # pivot, not d_k — d_k is identity padding there).
            out = (
                jnp.where(v, d_next, dprev),
                jnp.where(v, c_next, cprev),
                jnp.where(v, b_next, bprev),
                jnp.where(v, hll_n, hll),
                jnp.where(v, bl_n, bl),
            )
            return out, (pinv, pu, pc, pb, v)

        init = (d_seg[0], l0, b_seg[0],
                jnp.zeros((dof, dof), dtype), jnp.zeros((dof,), dtype))
        xs = (d_seg[1:], u_seg[:-1], b_seg[1:], v_seg[1:])
        (d_m, c_m, b_m, hll, bl), stacked = jax.lax.scan(step, init, xs)
        return d_m, c_m, b_m, hll, bl, stacked

    d_m, c_m, b_m, hll_acc, bl_acc, stacked = jax.vmap(eliminate)(
        d_blk, u_blk, rhs, lcpl, validj
    )
    pm_inv = jnp.linalg.inv(d_m)  # (nseg_local, dof, dof)

    # ---- skeleton assembly (all local segments at once) ----
    # Eliminate each segment's LAST interior pose onto (L, R); for empty
    # segments every eliminated quantity is zero and the chain edge's own
    # blocks flow through the same expressions.  Padded segments (segv
    # False) contribute nothing.
    pc = pm_inv @ c_m
    pr = pm_inv @ rcpl
    pb = jnp.einsum("sij,sj->si", pm_inv, b_m)
    cmt = jnp.swapaxes(c_m, -1, -2)
    rt = jnp.swapaxes(rcpl, -1, -2)
    sv = segv[:, None, None].astype(dtype)
    c_ll = (a_ii[seg_a] + hll_acc - cmt @ pc) * sv
    c_rr = (a_jj[seg_e] - rt @ pr) * sv
    c_lr = jnp.where(hasj[:, None, None], -cmt @ pr, a_ij[seg_a]) * sv
    c_rl = jnp.where(hasj[:, None, None], -rt @ pc,
                     jnp.swapaxes(a_ij[seg_a], -1, -2)) * sv
    svv = segv[:, None].astype(dtype)
    v_l = (-b_i[seg_a] + bl_acc
           - jnp.einsum("sij,sj->si", cmt, pb)) * svv
    v_r = (-b_j[seg_e] - jnp.einsum("sij,sj->si", rt, pb)) * svv

    ia = seg["ia"]
    ib = seg["ib"]
    hs = jnp.zeros((ns, dof, ns, dof), dtype)
    bs = jnp.zeros((ns, dof), dtype)
    hs = hs.at[ia, :, ia, :].add(c_ll)
    hs = hs.at[ib, :, ib, :].add(c_rr)
    hs = hs.at[ia, :, ib, :].add(c_lr)
    hs = hs.at[ib, :, ia, :].add(c_rl)
    bs = bs.at[ia].add(v_l)
    bs = bs.at[ib].add(v_r)
    if axis_name:
        hs = jax.lax.psum(hs, axis_name)
        bs = jax.lax.psum(bs, axis_name)
    # Loop-closure edges (both endpoints in the skeleton; replicated).
    if consts["n_loops"]:
        le, lia, lib = consts["loop_e"], consts["loop_ia"], consts["loop_ib"]
        hs = hs.at[lia, :, lia, :].add(a_ii[le])
        hs = hs.at[lib, :, lib, :].add(a_jj[le])
        hs = hs.at[lia, :, lib, :].add(a_ij[le])
        hs = hs.at[lib, :, lia, :].add(jnp.swapaxes(a_ij[le], -1, -2))
        bs = bs.at[lia].add(-b_i[le])
        bs = bs.at[lib].add(-b_j[le])
    # HARD gauge: delta_0 = 0 by deleting pose 0's rows/cols (skel[0]
    # is always pose 0).  A 1e8 soft prior would put the skeleton
    # system's f32 conditioning through the floor — measured 15x delta
    # error at 2048 poses even with capped segments; exact fixing keeps
    # the reduced system's condition at the intrinsic O(ns^2).
    hs_flat = hs.reshape(ns * dof, ns * dof)[dof:, dof:]
    hs_flat = hs_flat + 1e-10 * jnp.eye((ns - 1) * dof, dtype=dtype)
    x_rest = jnp.linalg.solve(hs_flat, bs.reshape(ns * dof)[dof:])
    x_s = jnp.concatenate(
        [jnp.zeros((dof,), dtype), x_rest]
    ).reshape(ns, dof)

    # Row p is a slack target for padded scatter indices.
    delta = jnp.zeros((p + 1, dof), dtype)

    # ---- back-substitution per local segment (reverse scan), vmapped ----
    def backsub(pm_inv_s, c_m_s, r_s, b_m_s, stacked_s, xl, xr):
        pinv_st, pu_st, pc_st, pb_st, v_st = stacked_s
        x_m = pm_inv_s @ (b_m_s - c_m_s @ xl - r_s @ xr)

        def step(x_next, t):
            pinv, pu, pc, pb, v = t
            x_k = pb - pu @ x_next - pc @ xl
            return jnp.where(v, x_k, x_next), jnp.where(v, x_k, 0.0 * x_k)

        _, xs_rev = jax.lax.scan(
            step, x_m, (pinv_st, pu_st, pc_st, pb_st, v_st), reverse=True
        )
        return x_m, xs_rev

    x_last, x_inner = jax.vmap(backsub)(
        pm_inv, c_m, rcpl, b_m, stacked, x_s[ia], x_s[ib]
    )
    delta = delta.at[seg["inner_pose"].reshape(-1)].set(
        x_inner.reshape(-1, dof), mode="drop"
    )
    delta = delta.at[seg["last_pose"]].set(x_last, mode="drop")
    if axis_name:
        delta = jax.lax.psum(delta, axis_name)
    delta = delta.at[consts["skel"]].set(x_s)
    return delta[:p]


_SCHUR_CACHE: dict = {}


def optimize_schur(
    graph: pg.PoseGraph,
    iters: int = 20,
    huber_k: float | None = None,
    kernel: str = "huber",
    delta_tol: float = 1e-10,
    mesh=None,
    seg_axis: str = "dp",
) -> pg.PoseGraph:
    """Gauss-Newton with the chain-elimination Schur solve per iteration.

    Same fixed point as ``pg.optimize(solve="dense")`` (the linear solves
    are exact); per-iteration cost is one parallel segment scan plus a
    dense solve of the tiny loop-closure skeleton.

    With ``mesh``, segments shard over ``seg_axis``: per-device Thomas
    elimination + psum'd skeleton — the distributed Schur-complement
    reduction (matches single-device to fp; tests/test_graph_schur.py)."""
    structure = _structure(graph)
    tcls, dof = pg._group(graph.poses)
    p = graph.poses.t.shape[0]

    # The jitted program must be cached across calls: a per-call closure
    # re-traces the whole GN scan every invocation (~seconds), which
    # would dominate any benchmark.  Keyed on everything that shapes the
    # traced program; jax.jit handles dtype/shape specialization within.
    key = (
        structure["p"], structure["skel"].tobytes(),
        structure["seg_a"].tobytes(), structure["n_int"].tobytes(),
        structure["loop_e"].tobytes(), structure["loop_ia"].tobytes(),
        structure["loop_ib"].tobytes(),
        iters, huber_k, kernel, delta_tol, mesh, seg_axis, dof,
    )
    cached = _SCHUR_CACHE.get(key)
    if cached is not None:
        return cached(graph)

    @functools.partial(jax.jit, static_argnames=())
    def run(graph):
        def gn_step(carry, _):
            g, done = carry
            r, ji, jj = pg.edge_residuals_and_jacobians(g)
            w = pg._edge_weights(r, g.info, g.edge_mask, huber_k, kernel)
            delta = _solve_delta(g, r, ji, jj, w, structure, mesh,
                                 seg_axis)
            delta = jnp.where(done, 0.0, delta)
            stepped = tcls.from_twist(delta)
            new_done = done | (jnp.sum(delta * delta) < delta_tol)
            return (g._replace(poses=stepped.compose(g.poses)),
                    new_done), None

        (out, _), _ = jax.lax.scan(
            gn_step, (graph, jnp.zeros((), bool)), None, length=iters
        )
        return out

    _SCHUR_CACHE[key] = run
    return run(graph)
