"""Pallas TPU kernel: tiled brute-force exact 1-NN.

The hot kernel of the engine (SURVEY.md §2.2).  Grid = (query tiles, db
tiles); the db axis is the inner (minor) grid dimension, so for each query
tile the kernel sweeps all db tiles while a VMEM carry holds the running
(best squared distance, best global index).  Mosaic pipelines the HBM->VMEM
tile streams; compute is pure VPU:

  dist[q, j] = sum_k (query[q, k] - db[j, k])^2

computed by broadcasting per-coordinate differences (D is 2..4, unrolled),
NOT via the |a|^2+|b|^2-2ab matmul identity — at D<=4 the MXU is idle
anyway and the cancellation error (~|p|^2 eps) would corrupt f32 argmin
ordering on mm-scale scans.

Tie-break matches ops.nn.nn_xla: lowest db index (within a tile via a
min-over-index trick on the masked candidate set; across tiles the carry
update is strict '<', so earlier tiles win).

Layout: points are passed coordinate-major ((D, N): D sublanes, N lanes)
so each coordinate row broadcasts cleanly across the 8x128 VPU; the
query tile is kept as (TQ, D) rows since TQ spans sublanes.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.ops.nn import NNResult

try:  # pragma: no cover - exercised only where pallas is present
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False


def available() -> bool:
    if not _HAS_PALLAS:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _nn_kernel(q_ref, db_ref, dist_ref, idx_ref, best_d, best_c,
               d_dim: int, db_tile: int, n_db_tiles: int):
    """One (query-tile, db-tile) grid step with DEFERRED argmin.

    The naive kernel reduces (TQ, TD) -> (TQ, 1) min+argmin on every db
    tile: the min pass, the dist==min compare, and the masked index-min
    are three extra sweeps of the distance tile, most of it cross-lane
    reduction work the VPU hates.  Instead keep per-LANE running minima:
    a (TQ, 128) carry where lane L tracks the best over all db columns
    congruent to L (mod 128).  Per 128-column chunk the update is one
    compare + two selects — pure elementwise, no reductions, no masking
    (invalid db points are pre-filled with a sentinel coordinate so their
    distance overflows to +inf), no index iota (only the scalar chunk
    counter is stored; the lane is implicit in the carry position).  The
    single cross-lane reduction happens once per query tile in the
    epilogue.

    q_ref:   (TQ, D)   queries
    db_ref:  (D, TD)   db tile, coordinate-major, sentinel-padded
    dist_ref/idx_ref: (TQ, 1) final output (written on the last db tile)
    best_d/best_c: (TQ, 128) VMEM scratch: best distance / best CHUNK id
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_c[:] = jnp.zeros_like(best_c)

    q = q_ref[:]  # (TQ, D)
    tq = q.shape[0]
    chunks_per_tile = db_tile // 128
    for c in range(chunks_per_tile):
        sl = slice(c * 128, (c + 1) * 128)
        dist = jnp.zeros((tq, 128), dtype=best_d.dtype)
        for k in range(d_dim):
            diff = q[:, k:k + 1] - db_ref[k:k + 1, sl]  # (TQ, 128)
            dist = dist + diff * diff
        better = dist < best_d[:]  # strict: earlier chunks win ties
        best_d[:] = jnp.where(better, dist, best_d[:])
        best_c[:] = jnp.where(better, j * chunks_per_tile + c, best_c[:])

    @pl.when(j == n_db_tiles - 1)
    def _epilogue():
        bd = best_d[:]  # (TQ, 128)
        m = jnp.min(bd, axis=1, keepdims=True)  # (TQ, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
        gidx = best_c[:] * 128 + lane
        big = jnp.iinfo(jnp.int32).max
        cand = jnp.where(bd == m, gidx, big)
        dist_ref[:] = m
        idx_ref[:] = jnp.min(cand, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("q_tile", "db_tile", "interpret")
)
def _nn_pallas_2d(
    query: Array,
    db_cm: Array,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
):
    """query: (Q, D); db_cm: (D, M) coordinate-major, sentinel-padded."""
    q, d_dim = query.shape
    m = db_cm.shape[1]
    n_q_tiles = q // q_tile
    n_db_tiles = m // db_tile

    kernel = functools.partial(
        _nn_kernel, d_dim=d_dim, db_tile=db_tile, n_db_tiles=n_db_tiles
    )
    grid = (n_q_tiles, n_db_tiles)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d_dim, db_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, 1), query.dtype),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, 128), query.dtype),
            pltpu.VMEM((q_tile, 128), jnp.int32),
        ],
        interpret=interpret,
    )(query, db_cm)
    return dist[:, 0], idx[:, 0]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Coordinate written into masked/padded db points.  In f32 the squared
# distance to any real query overflows to +inf on its own; _trim_sentinel
# makes the same contract hold in f64/interpret runs, where (3e19)^2 is a
# finite ~9e38 (ADVICE r1): any distance >= sentinel^2/4 can only come
# from a sentinel point, never from real data.
_SENTINEL = 3e19


def _trim_sentinel(dist_sq: Array) -> Array:
    return jnp.where(
        dist_sq >= jnp.asarray(_SENTINEL, dist_sq.dtype) ** 2 / 4,
        jnp.asarray(jnp.inf, dist_sq.dtype),
        dist_sq,
    )


def _nn_matched_kernel(q_ref, db_ref, dist_ref, idx_ref, pay_ref,
                       best_d, best_c, best_p, d_dim: int, f_dim: int,
                       db_tile: int, n_db_tiles: int):
    """Deferred-argmin sweep that ALSO carries the winner's payload.

    db_ref is (F, TD): rows 0..D-1 are coordinates (sentinel-padded),
    rows D..F-1 arbitrary per-point payload (e.g. the point itself,
    normals, validity).  Each per-lane carry update selects the payload
    alongside the distance, so the caller gets the matched payload
    directly — replacing a post-hoc take_along_axis gather, which at 28k
    rows costs more than the whole distance sweep on TPU.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_c[:] = jnp.zeros_like(best_c)
        best_p[:] = jnp.zeros_like(best_p)

    q = q_ref[:]  # (TQ, D)
    tq = q.shape[0]
    chunks_per_tile = db_tile // 128
    for c in range(chunks_per_tile):
        sl = slice(c * 128, (c + 1) * 128)
        dist = jnp.zeros((tq, 128), dtype=best_d.dtype)
        for k in range(d_dim):
            diff = q[:, k:k + 1] - db_ref[k:k + 1, sl]  # (TQ, 128)
            dist = dist + diff * diff
        better = dist < best_d[:]  # strict: earlier chunks win ties
        best_d[:] = jnp.where(better, dist, best_d[:])
        best_c[:] = jnp.where(better, j * chunks_per_tile + c, best_c[:])
        for f in range(f_dim):
            best_p[:, f * 128:(f + 1) * 128] = jnp.where(
                better, db_ref[d_dim + f:d_dim + f + 1, sl],
                best_p[:, f * 128:(f + 1) * 128],
            )

    @pl.when(j == n_db_tiles - 1)
    def _epilogue():
        bd = best_d[:]  # (TQ, 128)
        m = jnp.min(bd, axis=1, keepdims=True)  # (TQ, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
        gidx = best_c[:] * 128 + lane
        big = jnp.iinfo(jnp.int32).max
        cand = jnp.where(bd == m, gidx, big)
        winner_idx = jnp.min(cand, axis=1, keepdims=True)  # (TQ, 1)
        dist_ref[:] = m
        idx_ref[:] = winner_idx
        one_hot = cand == winner_idx  # exactly one lane per row
        for f in range(f_dim):
            pf = best_p[:, f * 128:(f + 1) * 128]
            pay_ref[:, f:f + 1] = jnp.sum(
                jnp.where(one_hot, pf, 0.0), axis=1, keepdims=True
            )


@functools.partial(
    jax.jit, static_argnames=("d_dim", "q_tile", "db_tile", "interpret")
)
def _nn_matched_2d(
    query: Array,
    dbf_cm: Array,
    d_dim: int,
    q_tile: int = 256,
    db_tile: int = 2048,
    interpret: bool = False,
):
    """query: (Q, D); dbf_cm: (F, M) rows = D coords then payload."""
    q = query.shape[0]
    f_total = dbf_cm.shape[0]
    f_dim = f_total - d_dim
    m = dbf_cm.shape[1]
    n_q_tiles = q // q_tile
    n_db_tiles = m // db_tile

    kernel = functools.partial(
        _nn_matched_kernel, d_dim=d_dim, f_dim=f_dim, db_tile=db_tile,
        n_db_tiles=n_db_tiles,
    )
    grid = (n_q_tiles, n_db_tiles)
    dist, idx, pay = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_total, db_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_tile, f_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q, 1), query.dtype),
            jax.ShapeDtypeStruct((q, 1), jnp.int32),
            jax.ShapeDtypeStruct((q, f_dim), query.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_tile, 128), query.dtype),
            pltpu.VMEM((q_tile, 128), jnp.int32),
            pltpu.VMEM((q_tile, 128 * f_dim), query.dtype),
        ],
        interpret=interpret,
    )(query, dbf_cm)
    return dist[:, 0], idx[:, 0], pay


def nn_pallas_matched(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    payload: Array | None = None,
    q_tile: int = 256,
    db_tile: int = 2048,
    interpret: bool = False,
    prune: bool = True,
    q_bound: Array | None = None,
    db_pack: "PackedDB | None" = None,
    warm: bool | None = None,
):
    """Exact 1-NN returning (NNResult, matched_payload (..., Q, P)).

    payload defaults to the db points themselves, so the common caller
    gets the matched coordinates without any gather.  Extra per-point
    features (normals, validity) can be appended by passing a (..., M, P)
    payload explicitly.  ``prune=True`` uses the rotated+bbox-pruned
    kernel (see _nn_pruned_kernel); exactness is preserved either way.
    ``q_bound`` (..., Q): optional upper bound on each query's NN
    distance² (e.g. last ICP iteration's distance plus query movement,
    squared) — seeds the prune threshold, results are bit-identical.
    ``db_pack``: a :func:`pack_db` result over (db, db_mask, payload,
    db_tile) — callers in an outer loop over a FIXED db (ICP drivers)
    build it once per frame so the db relayout stays out of the loop;
    db/payload are still consulted for shapes.
    """
    *batch, q, d_dim = query.shape
    m = db.shape[-2]
    if payload is None:
        payload = db

    q_pad = _round_up(q, q_tile)
    m_pad = _round_up(m, db_tile)
    pad_q = [(0, 0)] * (query.ndim - 2) + [(0, q_pad - q), (0, 0)]
    query_p = jnp.pad(query, pad_q)
    if db_pack is not None:
        dbf_cm = db_pack.dbf_cm
    else:
        dbf_cm = _dbf_cm_matched(db, db_mask, payload, m_pad)

    if prune and m_pad // db_tile < 3:
        prune = False
    # Vmapped pruned kernels don't lower on compiled Mosaic (see
    # nn_pallas): batched compiled calls take the plain sweep; batched
    # small-pair callers should use nn_pallas_matched_pairs.
    if prune and batch and not interpret:
        prune = False
    if prune:
        if q_bound is None:
            qb_p = jnp.full(query_p.shape[:-1], jnp.inf, query.dtype)
        else:
            # Padded queries get -inf: their (discarded) results may
            # then prune everything, which is free speed.
            qb_p = jnp.pad(
                q_bound.astype(query.dtype),
                [(0, 0)] * (q_bound.ndim - 1) + [(0, q_pad - q)],
                constant_values=-jnp.inf,
            )
        if q_bound is not None and not batch and d_dim + payload.shape[-1] <= 8:
            # Warmth-dispatched: survivor-list kernel once seeds are
            # finite, zig-zag kernel on the cold first iteration.
            if db_pack is not None:
                db_sl, cbox = db_pack.db_sl, db_pack.cbox
            else:
                db_sl, cbox = _seeded_prep(dbf_cm, d_dim)
            dist, idx, pay = _nn_seeded_2d(
                query_p, dbf_cm, db_sl, cbox, qb_p, d_dim=d_dim,
                q_tile=q_tile, db_tile=db_tile, interpret=interpret,
                cold_seed=_cold_seed_mode(), warm=warm,
            )
        else:
            fn = functools.partial(
                _nn_pruned_2d, d_dim=d_dim, q_tile=q_tile,
                db_tile=db_tile, interpret=interpret,
            )
            for _ in batch:
                fn = jax.vmap(fn)
            dist, idx, pay = fn(query_p, dbf_cm, qb_p)
    else:
        fn = functools.partial(
            _nn_matched_2d, d_dim=d_dim, q_tile=q_tile, db_tile=db_tile,
            interpret=interpret,
        )
        for _ in batch:
            fn = jax.vmap(fn)
        dist, idx, pay = fn(query_p, dbf_cm)
    dist = _trim_sentinel(dist)
    return (
        NNResult(index=idx[..., :q], dist_sq=dist[..., :q]),
        pay[..., :q, :],
    )


def _nn_pruned_kernel(q_ref, db_ref, qbox_ref, bbox_ref, qb_ref, dist_ref,
                      idx_ref, *rest, d_dim: int, f_dim: int, q_tile: int,
                      db_tile: int, n_db_tiles: int):
    """Deferred-argmin sweep with DIAGONAL ZIG-ZAG + EXACT TILE PRUNING.

    Two changes over _nn_kernel, both exactness-preserving:

    1. Diagonal-first visit order: query tile i starts its db sweep at
       its "diagonal" tile s = (i*q_tile)//db_tile and walks ascending to
       the end (tiles s..n-1), then walks the REMAINING tiles s-1..0 in
       DESCENDING order (the zig-zag; see tie-break note).  Spatially
       sorted scans + warm-started ICP mean a query tile's true matches
       concentrate near the diagonal — visiting it FIRST makes the
       running carry tight immediately.
    2. Pruning: per-db-tile bounding boxes (SMEM) give a lower bound on
       any distance between this query tile's bbox and the db tile; if
       that bound exceeds the carry's WORST per-lane best (maxd, SMEM
       scalar), no lane can be improved or tied, so the tile's compute is
       skipped (the DMA still streams — the kernel is compute-bound, the
       full 28800-pt stream is ~59 us of the ~2 ms budget).

    Exactness: pruning uses a strict bound test, so any candidate with
    dist <= best_d[lane] survives (lb <= dist <= best <= maxd passes);
    tie-break stays EXACTLY lowest-global-index with no per-pair index
    compare because of the zig-zag: the ascending segment visits
    ascending chunk ids with strict '<' (first seen = lowest wins), and
    the wrap segment visits strictly DESCENDING chunk ids (tiles s-1..0,
    chunks reversed within each tile) — all of them lower than anything
    in segment one — with '<=', so on a tie the latest (= lowest-id)
    candidate wins.

    With f_dim > 0 the winner's payload rides along exactly as in
    _nn_matched_kernel.

    ``qb_ref`` (SMEM, per q-tile) is an optional UPPER BOUND on the
    tile's worst true NN distance² (+inf when unknown): ICP's outer loop
    knows last iteration's distances, and dist_new(q) <= dist_prev(q) +
    |Δq| since the db is fixed — seeding the prune threshold with it
    makes tiles prune from j==1 instead of waiting for the carry to
    warm up.  Exactness: any candidate in any query's final tie set has
    dist = true_min(q) <= min(carry-threshold, bound) — never pruned.
    """
    if f_dim:
        pay_ref, best_d, best_c, best_p, maxd = rest
    else:
        best_d, best_c, maxd = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    chunks = db_tile // 128
    start = (i * q_tile) // db_tile
    wrap = j >= n_db_tiles - start  # second (descending) segment?
    actual = jnp.where(wrap, n_db_tiles - 1 - j, start + j)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_c[:] = jnp.zeros_like(best_c)
        if f_dim:
            best_p[:] = jnp.zeros_like(best_p)
        maxd[0] = qb_ref[i]

    # Scalar bbox-to-bbox lower bound (SMEM reads; runs on the scalar core
    # while the previous tile's vector work drains).
    lb = jnp.asarray(0.0, best_d.dtype)
    for k in range(d_dim):
        a = bbox_ref[actual, k] - qbox_ref[i, 4 + k]   # db_lo - q_hi
        b = qbox_ref[i, k] - bbox_ref[actual, 4 + k]   # q_lo - db_hi
        g = jnp.maximum(jnp.maximum(a, b), 0.0)
        lb = lb + g * g
    # One-sided exactness margin: lb is a rounded float expression (one
    # sub + one square + d-1 adds per axis) and can exceed the TRUE
    # box-to-point bound by a few ulp; the candidate distances it prunes
    # against carry similar rounding.  Deflate lb by a generous relative
    # margin so the prune test errs only toward keeping tiles — the
    # bit-identical-to-unpruned contract must not hinge on matched
    # rounding on both sides.
    lb = lb * (1.0 - 16.0 * jnp.finfo(best_d.dtype).eps)

    def sweep(reverse: bool):
        """One tile's chunk loop; reverse => descending ids with '<='."""
        q = q_ref[:]  # (TQ, D)
        tq = q.shape[0]
        base = actual * chunks
        order = range(chunks - 1, -1, -1) if reverse else range(chunks)
        for c in order:
            sl = slice(c * 128, (c + 1) * 128)
            dist = jnp.zeros((tq, 128), dtype=best_d.dtype)
            for k in range(d_dim):
                diff = q[:, k:k + 1] - db_ref[k:k + 1, sl]  # (TQ, 128)
                dist = dist + diff * diff
            bd = best_d[:]
            better = (dist <= bd) if reverse else (dist < bd)
            best_d[:] = jnp.where(better, dist, bd)
            best_c[:] = jnp.where(better, base + c, best_c[:])
            if f_dim:
                for f in range(f_dim):
                    best_p[:, f * 128:(f + 1) * 128] = jnp.where(
                        better, db_ref[d_dim + f:d_dim + f + 1, sl],
                        best_p[:, f * 128:(f + 1) * 128],
                    )
        # Pruning bound: the worst QUERY'S current best (min over its
        # lane carries), not the worst lane carry.  Exact for the final
        # output: a skipped candidate has dist >= lb > maxd >= its
        # query's min, so it can change neither the epilogue's
        # min-over-lanes nor (strictness) its tie set.
        maxd[0] = jnp.minimum(
            jnp.max(jnp.min(best_d[:], axis=1)), qb_ref[i]
        )

    run = (j == 0) | (lb <= maxd[0])

    @pl.when(run & ~wrap)
    def _work_fwd():
        sweep(reverse=False)

    @pl.when(run & wrap)
    def _work_rev():
        sweep(reverse=True)

    @pl.when(j == n_db_tiles - 1)
    def _epilogue():
        bd = best_d[:]  # (TQ, 128)
        m = jnp.min(bd, axis=1, keepdims=True)  # (TQ, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
        gidx = best_c[:] * 128 + lane
        big = jnp.iinfo(jnp.int32).max
        cand = jnp.where(bd == m, gidx, big)
        winner_idx = jnp.min(cand, axis=1, keepdims=True)
        dist_ref[:] = m
        idx_ref[:] = winner_idx
        if f_dim:
            one_hot = cand == winner_idx
            for f in range(f_dim):
                pf = best_p[:, f * 128:(f + 1) * 128]
                pay_ref[:, f:f + 1] = jnp.sum(
                    jnp.where(one_hot, pf, 0.0), axis=1, keepdims=True
                )


def _tile_boxes(cm: Array, tile: int) -> Array:
    """Per-tile coordinate bounds of a sentinel-padded coordinate-major
    cloud.  cm: (R, M) with rows 0..d-1 = coordinates (payload rows, if
    any, are ignored by the caller passing only the coordinate rows).
    Returns (M//tile, 8): cols 0..3 = lo (inf where the tile is all
    sentinel), cols 4..7 = hi (-inf likewise) — an empty tile's lower
    bound is +inf, so it is pruned whenever anything real has been seen.
    """
    d, m = cm.shape
    n_tiles = m // tile
    t = cm.reshape(d, n_tiles, tile)
    valid = t[0] < _SENTINEL / 2  # sentinel marks whole points
    lo = jnp.min(jnp.where(valid[None], t, jnp.inf), axis=-1)   # (d, n)
    hi = jnp.max(jnp.where(valid[None], t, -jnp.inf), axis=-1)  # (d, n)
    pad = ((0, 4 - d), (0, 0))
    lo = jnp.pad(lo, pad)
    hi = jnp.pad(hi, pad, constant_values=0.0)
    return jnp.concatenate([lo, hi], axis=0).T  # (n_tiles, 8)


def _query_boxes(query_p: Array, tile: int) -> Array:
    """(Q//tile, 8) per-query-tile bounds (padding zeros included — they
    only widen the box, which is conservative)."""
    q, d = query_p.shape
    n_tiles = q // tile
    t = query_p.reshape(n_tiles, tile, d)
    lo = jnp.min(t, axis=1)  # (n, d)
    hi = jnp.max(t, axis=1)
    pad = ((0, 0), (0, 4 - d))
    return jnp.concatenate(
        [jnp.pad(lo, pad), jnp.pad(hi, pad)], axis=-1
    )  # (n_tiles, 8)


@functools.partial(
    jax.jit, static_argnames=("d_dim", "q_tile", "db_tile", "interpret")
)
def _nn_pruned_2d(
    query: Array,
    dbf_cm: Array,
    q_bound: Array,
    d_dim: int,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
):
    """query: (Q, D); dbf_cm: (F, M) rows = D coords (sentinel-padded)
    then optional payload rows; q_bound: (Q,) upper bound on each
    query's NN distance² (+inf = unknown; padded entries -inf so
    all-padding tiles prune everything).  Returns (dist, idx[, payload])."""
    q = query.shape[0]
    f_total, m = dbf_cm.shape
    f_dim = f_total - d_dim
    n_q_tiles = q // q_tile
    n_db_tiles = m // db_tile

    qbox = _query_boxes(query, q_tile)
    bbox = _tile_boxes(dbf_cm[:d_dim], db_tile)
    qb_tile = jnp.max(q_bound.reshape(n_q_tiles, q_tile), axis=1)

    kernel = functools.partial(
        _nn_pruned_kernel, d_dim=d_dim, f_dim=f_dim, q_tile=q_tile,
        db_tile=db_tile, n_db_tiles=n_db_tiles,
    )
    grid = (n_q_tiles, n_db_tiles)

    def rot(i, j):
        # Zig-zag: ascending from the diagonal tile, then the remaining
        # tiles in descending order (must mirror _nn_pruned_kernel).
        start = (i * q_tile) // db_tile
        return (0, jnp.where(j >= n_db_tiles - start,
                             n_db_tiles - 1 - j, start + j))
    out_specs = [
        pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, 1), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((q, 1), query.dtype),
        jax.ShapeDtypeStruct((q, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((q_tile, 128), query.dtype),
        pltpu.VMEM((q_tile, 128), jnp.int32),
    ]
    if f_dim:
        out_specs.append(
            pl.BlockSpec((q_tile, f_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((q, f_dim), query.dtype))
        scratch.append(pltpu.VMEM((q_tile, 128 * f_dim), query.dtype))
    scratch.append(pltpu.SMEM((1,), query.dtype))  # maxd

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_dim), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_total, db_tile), rot,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(query, dbf_cm, qbox, bbox, qb_tile)
    if f_dim:
        dist, idx, pay = out
        return dist[:, 0], idx[:, 0], pay
    dist, idx = out
    return dist[:, 0], idx[:, 0]


def nn_pallas(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
    prune: bool = True,
    q_bound: Array | None = None,
) -> NNResult:
    """Exact 1-NN via the Pallas kernel; same contract as ops.nn.nn_xla.

    Handles padding to tile multiples and arbitrary leading batch dims
    (vmapped over the kernel).  ``prune=True`` (default) uses the
    rotated+bbox-pruned kernel (_nn_pruned_kernel) — exact, including
    tie-breaks; ``prune=False`` keeps the plain linear sweep.
    """
    *batch, q, d_dim = query.shape
    m = db.shape[-2]

    q_pad = _round_up(q, q_tile)
    m_pad = _round_up(m, db_tile)
    pad_q = [(0, 0)] * (query.ndim - 2) + [(0, q_pad - q), (0, 0)]
    pad_m = [(0, 0)] * (db.ndim - 2) + [(0, m_pad - m), (0, 0)]
    query_p = jnp.pad(query, pad_q)
    # Invalid/padded db points become a distant sentinel: their squared
    # distance overflows to +inf (f32) or is trimmed to +inf after the
    # sweep (f64/interpret), so no in-kernel masking is needed.
    sentinel = jnp.asarray(_SENTINEL, db.dtype)
    if db_mask is not None:
        db = jnp.where(db_mask[..., None], db, sentinel)
    db_p = jnp.pad(db, pad_m, constant_values=sentinel)

    db_cm = jnp.swapaxes(db_p, -1, -2)  # (..., D, M)

    # With <3 db tiles there is nothing to prune (tile 0 always runs and
    # the bound only settles after it); skip the bbox/SMEM overhead.
    if prune and m_pad // db_tile < 3:
        prune = False
    # Vmapped pruned kernels don't lower on compiled Mosaic: the batch
    # dim turns the per-tile SMEM row windows into (Squeezed, k) block
    # shapes that violate the (8, 128)-divisibility rule (interpret
    # mode accepts them — CPU tests keep the vmapped pruned path).
    # Batched compiled calls fall back to the plain sweep; batched
    # SMALL-pair callers should use the pair-grid kernel
    # (nn_pallas_matched_pairs) instead.
    if prune and batch and not interpret:
        prune = False
    if prune:
        if q_bound is None:
            qb_p = jnp.full(query_p.shape[:-1], jnp.inf, query.dtype)
        else:
            qb_p = jnp.pad(
                q_bound.astype(query.dtype),
                [(0, 0)] * (q_bound.ndim - 1) + [(0, q_pad - q)],
                constant_values=-jnp.inf,
            )
        if q_bound is not None and not batch and d_dim <= 8:
            db_sl, cbox = _seeded_prep(db_cm, d_dim)
            dist, idx = _nn_seeded_2d(
                query_p, db_cm, db_sl, cbox, qb_p, d_dim=d_dim,
                q_tile=q_tile, db_tile=db_tile, interpret=interpret,
                cold_seed=_cold_seed_mode(),
            )
        else:
            fn = functools.partial(
                _nn_pruned_2d, d_dim=d_dim, q_tile=q_tile,
                db_tile=db_tile, interpret=interpret,
            )
            for _ in batch:
                fn = jax.vmap(fn)
            dist, idx = fn(query_p, db_cm, qb_p)
    else:
        fn = functools.partial(
            _nn_pallas_2d, q_tile=q_tile, db_tile=db_tile,
            interpret=interpret,
        )
        for _ in batch:
            fn = jax.vmap(fn)
        dist, idx = fn(query_p, db_cm)
    dist = _trim_sentinel(dist)
    return NNResult(
        index=idx[..., :q], dist_sq=dist[..., :q]
    )


# --------------------------------------------------------------------------
# Survivor-list NN: the WARM-iteration kernel (round-3 headline attack).
#
# Round-3 profiling: with seeded bounds the zig-zag kernel's time is the
# mandatory diagonal db tile — tile-level pruning cannot prune the tile
# that CONTAINS the matches, so its 16 chunks (2048 points) all run for
# every query tile although the matches span ~a few 128-pt chunks.  Both
# in-kernel finer pruning variants lose (a branch per chunk and a dynamic
# chunk-range fori both cost more than they save; see docs/DESIGN.md
# round-3 notes).  What wins is moving the WHOLE prune decision OUT of
# the kernel: an XLA pre-pass evaluates the bbox lower-bound test for
# every (query-tile, chunk) pair at once (a trivial (n_q, n_chunks)
# elementwise matrix) and compacts each row's surviving chunk ids into a
# short SMEM list; the kernel then walks exactly those chunks with one
# dynamic 8-aligned sublane vreg load per chunk (db in chunk-sublane
# layout, fully VMEM-resident), _LIST_UNROLL chunks per fori iteration.
#
# Exactness: a chunk is absent from a row's list iff its (one-sided-
# margin) lower bound exceeds the row's seeded upper bound qb >= every
# true NN distance in the tile, so none of its candidates are in any
# final tie set; listed chunks are visited in ascending id order with
# strict '<', preserving the lowest-index tie-break bit-for-bit.  Rows
# whose survivor count exceeds the list capacity fall back to the full
# ascending sweep (still exact).  List tails are padded by REPEATING the
# row's first listed chunk: re-running a chunk cannot change a strict-<
# carry.
#
# The kernel requires a valid finite seed, so the driver dispatches on
# warmth (lax.cond): iteration 1 (+inf bounds) first buys a seed with the
# decimated pre-pass below (ICP_NN_COLD_SEED=0 restores the zig-zag
# carry-pruned kernel there), every later iteration takes this one
# directly.  Measured on the 28800-pt 3D frames (Morton-sorted,
# steady-state seeds): 0.96 ms -> 0.22 ms per sweep.
# --------------------------------------------------------------------------

_LIST_CAP = 48
_LIST_UNROLL = int(os.environ.get("ICP_NN_LIST_UNROLL", "4"))
# Query groups per tile for the survivor bound test (q_tile must divide
# evenly); 1 restores the whole-tile test for A/B runs.
_LIST_GROUPS = int(os.environ.get("ICP_NN_LIST_GROUPS", "4"))

# Cold-iteration seeding (round 3, late): iteration 1 has no previous-
# iteration distances, so it used to take the zig-zag kernel (~0.90 ms on
# the 28800-pt headline vs ~0.22 ms warm).  A DECIMATED pre-pass fixes
# that: the exact NN distance among every _COLD_SEED_STRIDE-th db point
# (a column stride of the Morton-sorted cloud, so the subset is spatially
# spread) is a true upper bound on the full-db NN distance — a min over a
# subset can only be larger — and it costs ~1/stride of a full sweep.
# That bound warms the survivor-list path for iteration 1 too.  Exactness:
# the subset distances are computed by the SAME kernel expression on the
# same points, so the bound holds in computed f32 arithmetic; the usual
# one-sided margins (deflated chunk lower bounds, inflated qb) guard the
# box tests.  A loose bound can only overflow a row's survivor list,
# which falls back to the exact full sweep.  ICP_NN_COLD_SEED=0 restores
# the zig-zag cold path for A/B runs.
_COLD_SEED_STRIDE = 8
_COLD_SEED = os.environ.get("ICP_NN_COLD_SEED", "1")


def _cold_seed_mode() -> str:
    """The cold-seed strategy, read at the call site (trace time) and
    passed to _nn_seeded_2d as a STATIC argument so the jit cache keys on
    it — an in-process toggle of the module global retraces instead of
    silently reusing the old strategy (ADVICE r3; no clear_cache()
    needed).  ICP_NN_COLD_SEED seeds the global once at import."""
    return _COLD_SEED


def _center_bound(query_p, cbox, d_dim: int):
    """Cold-iteration upper bound on each query's NN distance² from the
    per-chunk boxes alone — NO decimated-db gather.

    For any chunk and any of its points p: dist(q, p) <= dist(q, center)
    + half-diagonal (triangle inequality), and when every point of the
    chunk is valid that p is a legal NN candidate, so the min over
    chunks upper-bounds the true NN distance.  Chunks containing
    sentinel-masked or padded lanes have half-diagonals ~1e30: their
    term is astronomically large — valid (an upper bound may be loose)
    and self-excluding from the min.  If ALL chunks are polluted the
    bound degenerates to ~inf and the list path falls back to the exact
    full sweep.

    Replaces the round-3 stride-8 decimated pre-pass: its lane-strided
    gather lowered to a ~3,800-iteration SCALAR while loop on TPU
    (row-by-row dynamic-slice/update; round-4 device trace) costing
    several ms per frame — the real owner of the headline's
    unaccounted budget.  This is one fused elementwise+reduce pass over
    (Q, n_chunks) instead.
    """
    lo = cbox[None, :, :d_dim]           # (1, nc, d)
    hi = cbox[None, :, 4:4 + d_dim]
    # Fully-empty (all-padding) chunks carry the box test's empty
    # convention lo=+inf, hi=-inf; 0.5*(lo+hi) would be NaN and a single
    # NaN poisons the min below — sanitize to a zero box and force the
    # chunk's term to +inf instead (an empty chunk witnesses nothing).
    empty = lo > hi                       # (1, nc, d)
    lo = jnp.where(empty, 0.0, lo)
    hi = jnp.where(empty, 0.0, hi)
    center = 0.5 * (lo + hi)
    half_diag = 0.5 * jnp.sqrt(
        jnp.sum((hi - lo) * (hi - lo), axis=-1)
    )  # (1, nc)
    d2 = jnp.sum(
        (query_p[:, None, :d_dim] - center) ** 2, axis=-1
    )  # (Qp, nc)
    eps = jnp.finfo(d2.dtype).eps
    # Conservative fp inflation at each rounding site, then the drivers'
    # usual one-sided 32-eps margin on the squared bound.
    b = (jnp.sqrt(d2) * (1.0 + 8.0 * eps) + half_diag) ** 2
    b = jnp.where(jnp.any(empty, axis=-1), jnp.inf, b)
    return jnp.min(b, axis=1) * (1.0 + 32.0 * eps)


def _decimated_bound(query_p, dbf_cm, d_dim: int, n_q: int, q_tile: int,
                     interpret: bool):
    """Decimated upper-bound pre-pass (kept for A/B via
    ICP_NN_COLD_SEED=5; superseded by :func:`_center_bound` — the
    lane-strided gather below lowers to a scalar row-copy while loop on
    TPU): every _COLD_SEED_STRIDE-th db column is its own tiny
    sentinel-padded db in chunk-sublane layout, swept in the list
    kernel's full-walk branch (cnt > cap with cap=1 — no SMEM list
    traffic).  Returns a per-query true upper bound on the full-db NN
    distance², inflated by the drivers' usual one-sided 32-eps margin."""
    sub = dbf_cm[:d_dim, ::_COLD_SEED_STRIDE]
    m_sub = sub.shape[1]
    m_sub_pad = _round_up(m_sub, 128)
    sub = jnp.pad(sub, ((0, 0), (0, m_sub_pad - m_sub)),
                  constant_values=_SENTINEL)
    nc_sub = m_sub_pad // 128
    sub_sl = jnp.swapaxes(sub.reshape(d_dim, nc_sub, 128), 0, 1)
    sub_sl = jnp.pad(sub_sl, ((0, 0), (0, 8 - d_dim), (0, 0)))
    sub_sl = sub_sl.reshape(nc_sub * 8, 128)
    dist_sub = _nn_list_2d(
        query_p, sub_sl,
        jnp.zeros((n_q, 1), jnp.int32),
        jnp.full((n_q, 1), 2, jnp.int32),  # > cap: full walk
        d_dim, 0, q_tile, 1, interpret,
    )[0]
    # Defensive inflation (the subset distance is the same kernel
    # expression on the same point, so it already bounds the computed
    # best; 32 eps matches the drivers' margins).
    return dist_sub * (1.0 + 32.0 * jnp.finfo(dist_sub.dtype).eps)


def _nn_list_kernel(q_ref, db_ref, list_ref, cnt_ref, dist_ref, idx_ref,
                    *rest, d_dim: int, f_dim: int, n_chunks: int,
                    q_tile: int, cap: int):
    """One grid step = one query tile; db fully VMEM-resident in
    chunk-sublane layout (n_chunks*8, 128): rows c*8+k hold coordinate/
    payload row k of chunk c, so one aligned dynamic load yields a whole
    chunk as a single (8, 128) vreg."""
    if f_dim:
        pay_ref, best_d, best_c, best_p = rest
    else:
        best_d, best_c = rest
    i = pl.program_id(0)
    q = q_ref[:]  # (TQ, D)
    best_d[:] = jnp.full_like(best_d, jnp.inf)
    best_c[:] = jnp.zeros_like(best_c)
    if f_dim:
        best_p[:] = jnp.zeros_like(best_p)
    cnt = cnt_ref[i, 0]

    def chunk(c):
        blk = db_ref[pl.ds(c * 8, 8), :]  # (8, 128): one vreg
        dist = jnp.zeros((q_tile, 128), dtype=best_d.dtype)
        for k in range(d_dim):
            diff = q[:, k:k + 1] - blk[k:k + 1, :]
            dist = dist + diff * diff
        better = dist < best_d[:]  # strict: ascending ids, lowest wins
        best_d[:] = jnp.where(better, dist, best_d[:])
        best_c[:] = jnp.where(better, c, best_c[:])
        if f_dim:
            for f in range(f_dim):
                best_p[:, f * 128:(f + 1) * 128] = jnp.where(
                    better, blk[d_dim + f:d_dim + f + 1, :],
                    best_p[:, f * 128:(f + 1) * 128],
                )

    @pl.when(cnt <= cap)
    def _listed():
        def body(t, u):
            for uu in range(_LIST_UNROLL):
                chunk(list_ref[i, t * _LIST_UNROLL + uu])
            return u
        jax.lax.fori_loop(
            0, (cnt + _LIST_UNROLL - 1) // _LIST_UNROLL, body, 0
        )

    @pl.when(cnt > cap)
    def _full():
        def body(t, u):
            for uu in range(_LIST_UNROLL):
                chunk(t * _LIST_UNROLL + uu)
            return u
        jax.lax.fori_loop(0, n_chunks // _LIST_UNROLL, body, 0)
        for c in range(n_chunks - n_chunks % _LIST_UNROLL, n_chunks):
            chunk(c)

    bd = best_d[:]  # (TQ, 128)
    m = jnp.min(bd, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
    gidx = best_c[:] * 128 + lane
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(bd == m, gidx, big)
    winner = jnp.min(cand, axis=1, keepdims=True)
    dist_ref[:] = m
    idx_ref[:] = winner
    if f_dim:
        one_hot = cand == winner
        for f in range(f_dim):
            pf = best_p[:, f * 128:(f + 1) * 128]
            pay_ref[:, f:f + 1] = jnp.sum(
                jnp.where(one_hot, pf, 0.0), axis=1, keepdims=True
            )


def _nn_list_2d(query_p, db_sl, lists, cnt, d_dim: int, f_dim: int,
                q_tile: int, cap: int, interpret: bool):
    """query_p: (Qp, D); db_sl: (n_chunks*8, 128); lists: (n_q, cap) i32;
    cnt: (n_q, 1) i32.  Returns (dist, idx[, pay]) like _nn_pruned_2d."""
    qp = query_p.shape[0]
    n_q = qp // q_tile
    n_chunks = db_sl.shape[0] // 8

    out_specs = [
        pl.BlockSpec((q_tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_tile, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((qp, 1), query_p.dtype),
        jax.ShapeDtypeStruct((qp, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((q_tile, 128), query_p.dtype),
        pltpu.VMEM((q_tile, 128), jnp.int32),
    ]
    if f_dim:
        out_specs.append(
            pl.BlockSpec((q_tile, f_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((qp, f_dim), query_p.dtype)
        )
        scratch.append(pltpu.VMEM((q_tile, 128 * f_dim), query_p.dtype))

    out = pl.pallas_call(
        functools.partial(
            _nn_list_kernel, d_dim=d_dim, f_dim=f_dim, n_chunks=n_chunks,
            q_tile=q_tile, cap=cap,
        ),
        grid=(n_q,),
        in_specs=[
            pl.BlockSpec((q_tile, d_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole db resident
            pl.BlockSpec(memory_space=pltpu.SMEM),  # survivor lists
            pl.BlockSpec(memory_space=pltpu.SMEM),  # survivor counts
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(query_p, db_sl, lists, cnt)
    if f_dim:
        dist, idx, pay = out
        return dist[:, 0], idx[:, 0], pay
    dist, idx = out
    return dist[:, 0], idx[:, 0]


class PackedDB(NamedTuple):
    """Loop-invariant NN db preparation — the KdTree-build analogue
    (reference src/lib.rs:97-102 builds its tree ONCE per frame).

    The chunk-sublane relayout (db_sl) lowers to ~3 tiny XLA ops PER
    128-pt CHUNK; left inside the drivers' outer while_loop it ran every
    ICP iteration (~675 ops + inter-op gaps ≈ several ms/frame at 28.8k
    points — XLA does NOT hoist it; round-4 device trace).  Drivers
    build the pack once per frame, outside the outer loop, and pass it
    through ``db_pack``.

    Fields are exactly what nn_pallas_matched would compute inline:
    dbf_cm (F_total, m_pad) sentinel-padded coordinate-major db+payload;
    db_sl (n_chunks*8, 128) chunk-sublane layout; cbox (n_chunks, 8)
    per-chunk coordinate bounds.  Bit-identical results either way.
    """

    dbf_cm: Array
    db_sl: Array
    cbox: Array


def _seeded_prep(dbf_cm: Array, d_dim: int):
    """(db_sl, cbox) for the survivor-list kernel from a padded
    coordinate-major db — see PackedDB."""
    f_total, m_pad = dbf_cm.shape
    n_chunks = m_pad // 128
    db_sl = jnp.swapaxes(
        dbf_cm.reshape(f_total, n_chunks, 128), 0, 1
    )  # (nc, F, 128)
    db_sl = jnp.pad(db_sl, ((0, 0), (0, 8 - f_total), (0, 0)))
    db_sl = db_sl.reshape(n_chunks * 8, 128)
    cbox = _tile_boxes(dbf_cm[:d_dim], 128)  # (nc, 8)
    return db_sl, cbox


def _dbf_cm_matched(db, db_mask, payload, m_pad: int):
    """Sentinel-padded coordinate-major [db; payload] rows — the exact
    ops nn_pallas_matched runs inline (payload rows are NOT sentinel-
    masked, matching the inline path: masked points can never win, so
    their payload is dead)."""
    m = db.shape[-2]
    pad_m = [(0, 0)] * (db.ndim - 2) + [(0, m_pad - m), (0, 0)]
    sentinel = jnp.asarray(_SENTINEL, db.dtype)
    if db_mask is not None:
        db = jnp.where(db_mask[..., None], db, sentinel)
    db_p = jnp.pad(db, pad_m, constant_values=sentinel)
    pay_p = jnp.pad(
        payload,
        [(0, 0)] * (payload.ndim - 2) + [(0, m_pad - m), (0, 0)],
    )
    return jnp.concatenate(
        [jnp.swapaxes(db_p, -1, -2), jnp.swapaxes(pay_p, -1, -2)],
        axis=-2,
    )


def pack_db(
    db: Array,
    db_mask: Array | None = None,
    payload: Array | None = None,
    db_tile: int = 2048,
) -> PackedDB:
    """Build the loop-invariant NN index over ``db`` (see PackedDB).
    ``payload`` defaults to the db points themselves, mirroring
    nn_pallas_matched."""
    if payload is None:
        payload = db
    d_dim = db.shape[-1]
    m_pad = _round_up(db.shape[-2], db_tile)
    dbf_cm = _dbf_cm_matched(db, db_mask, payload, m_pad)
    db_sl, cbox = _seeded_prep(dbf_cm, d_dim)
    return PackedDB(dbf_cm=dbf_cm, db_sl=db_sl, cbox=cbox)


@functools.partial(
    jax.jit,
    static_argnames=("d_dim", "q_tile", "db_tile", "interpret",
                     "cold_seed", "warm"),
)
def _nn_seeded_2d(
    query_p: Array,
    dbf_cm: Array,
    db_sl: Array,
    cbox: Array,
    q_bound: Array,
    d_dim: int,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
    cold_seed: str = "1",
    warm: bool | None = None,
):
    """Warmth-dispatched pruned NN: iterations with finite seeds take the
    survivor-list kernel directly; iteration 1 (+inf bounds) first buys
    itself a seed with the decimated pre-pass (or, with
    ICP_NN_COLD_SEED=0, takes the round-2 zig-zag carry-pruned kernel).
    Same contract/outputs as _nn_pruned_2d, bit-identical across the
    dispatch.  db_sl/cbox come from :func:`_seeded_prep` — hoisted to
    once per frame when the caller passes a PackedDB.

    ``warm`` makes the dispatch STATIC: True traces only the survivor-
    list path, False only the cold path, None keeps the runtime
    lax.cond.  Drivers that peel ICP iteration 1 out of their outer
    while loop pass False for it and True for the loop body — the
    round-5 device trace priced the in-loop conditional at ~0.04 ms
    per outer iteration (branch materialization + boundary copies).
    Exactness does not depend on the flag: the list path with +inf
    bounds degrades to the full in-kernel sweep (cnt > cap fallback),
    so a "wrong" static flag costs speed, never correctness."""
    f_total, m_pad = dbf_cm.shape
    f_dim = f_total - d_dim
    n_chunks = m_pad // 128
    n_q = query_p.shape[0] // q_tile
    cap = min(_LIST_CAP, n_chunks)

    def _list_path(qb):
        # Survivor test per query GROUP (q_tile // _LIST_GROUPS
        # consecutive Morton-ordered queries), unioned into the tile's
        # list: a group's box spans a compact Z-order patch and its
        # seeded bound maxes over the group only, so one outlier query
        # contaminates its own group rather than the whole tile (the
        # same union trick the pairs kernel uses, and the tile-size
        # lesson behind q_tile=256 beating 512).  Exact: a chunk holding
        # the true NN (or a tie) of query q in group g has
        # lb(group box, chunk) <= dist(q, that point) <= qb(q) <=
        # max-over-group qb, so it always survives; the union can only
        # ADD chunks relative to any member's own test.  Bit-identical
        # outputs — skipped chunks are in no tie set.
        grp = _LIST_GROUPS if q_tile % max(_LIST_GROUPS, 1) == 0 else 1
        qg = query_p.reshape(n_q * grp, q_tile // grp, d_dim)
        qlo = jnp.min(qg, axis=1)  # (n_q*grp, d)
        qhi = jnp.max(qg, axis=1)
        a = cbox[None, :, :d_dim] - qhi[:, None, :]
        b = qlo[:, None, :] - cbox[None, :, 4:4 + d_dim]
        g = jnp.maximum(jnp.maximum(a, b), 0.0)
        lb = jnp.sum(g * g, axis=-1)  # (n_q*grp, nc)
        # One-sided margin, same argument as _nn_pruned_kernel.
        lb = lb * (1.0 - 16.0 * jnp.finfo(lb.dtype).eps)
        qbt = jnp.max(qb.reshape(n_q * grp, q_tile // grp), axis=1)
        ok = jnp.any(
            (lb <= qbt[:, None]).reshape(n_q, grp, n_chunks), axis=1
        )
        cnt = jnp.sum(ok, axis=1).astype(jnp.int32)
        key = jnp.where(
            ok, jnp.arange(n_chunks, dtype=jnp.int32)[None, :],
            jnp.int32(n_chunks),
        )
        srt = jnp.sort(key, axis=1)[:, :cap]
        # Pad each list's tail with its own FIRST chunk (idempotent
        # under the strict-< carry) so unrolled steps stay exact.
        pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
        lists = jnp.where(pos < cnt[:, None], srt, srt[:, :1])
        return _nn_list_2d(
            query_p, db_sl, lists.astype(jnp.int32), cnt[:, None],
            d_dim, f_dim, q_tile, cap, interpret,
        )

    def warm_fn(_):
        return _list_path(q_bound)

    if cold_seed == "3":
        # No warmth cond at all: ALWAYS compute the center bound and
        # take the tighter of (real seed, center bound) — both are
        # valid upper bounds, min stays valid; padded queries keep -inf.
        # Rationale: measured evidence that the warmth lax.cond executes
        # both branches inside the drivers' fused while loop, so a cond
        # costs warm iterations the whole cold branch anyway.
        qb_cb = _center_bound(query_p, cbox, d_dim)
        return _list_path(jnp.minimum(q_bound, qb_cb))

    if warm is True:
        return warm_fn(None)
    if cold_seed != "0":
        def cold_fn(_):
            # The pre-pass stays INSIDE the cold branch: outside the
            # cond it taxed every WARM iteration (measured 147 -> 95 f/s
            # on the headline before it was moved in).
            if cold_seed == "5":  # A/B: round-3 decimated-db gather
                qb = _decimated_bound(
                    query_p, dbf_cm, d_dim, n_q, q_tile, interpret
                )
            else:
                qb = _center_bound(query_p, cbox, d_dim)
            if cold_seed == "2":  # A/B bisect: seeded zig-zag instead
                return _nn_pruned_2d(
                    query_p, dbf_cm, qb, d_dim=d_dim, q_tile=q_tile,
                    db_tile=db_tile, interpret=interpret,
                )
            return _list_path(qb)
    else:
        def cold_fn(_):
            return _nn_pruned_2d(
                query_p, dbf_cm, q_bound, d_dim=d_dim, q_tile=q_tile,
                db_tile=db_tile, interpret=interpret,
            )

    if warm is False:
        return cold_fn(None)
    return jax.lax.cond(jnp.any(jnp.isfinite(q_bound)), warm_fn, cold_fn,
                        None)


# --------------------------------------------------------------------------
# Pair-grid batched NN: many small pairs, ONE pallas_call (VERDICT r2 #2).
#
# The batched multi-pair driver (209 consecutive scan pairs at 768 points)
# cannot use the single-cloud kernels efficiently: their outputs/queries
# are narrow (N, 1..3) windows, and blocking MANY pairs' rows into one
# grid step pads the lane dimension 64-128x in scoped VMEM (a pair_blk=8
# block measured 18.5 MB scoped — over the 16 MB budget).  Instead the
# grid is (pair, query-subtile): every step's windows are one subtile's
# (q_sub, D) queries, one pair's (F, M) db, and (q_sub, 1|P) outputs —
# a few hundred KB scoped regardless of the batch size — and the
# per-step overhead is the same ~0.1 us as the single-cloud kernels'
# inner grid axis (the round-2 "vmapped kernel is 4-6x slower"
# anti-result was about vmapping the whole zig-zag kernel with its
# carries and SMEM tables, not about grid steps per se).
#
# Pruning is SEED-ONLY and exact: chunk c is skipped for a query subtile
# iff the bbox-to-bbox lower bound exceeds the subtile's seeded upper
# bound on its worst true NN distance (from the ICP outer loop's previous
# iteration: dist_new <= dist_prev + |dq|).  A pruned chunk's candidates
# all satisfy dist >= lb > bound >= true_min, so they are in no query's
# tie set; surviving chunks are visited in ascending order with strict
# '<', preserving the lowest-index tie-break bit-for-bit.  No in-kernel
# carry/threshold updates means no cross-lane reductions outside the
# epilogue — the first (unseeded) ICP iteration simply runs unpruned.
# --------------------------------------------------------------------------


def _nn_pairs_kernel(q_ref, db_ref, qbox_ref, bbox_ref, qb_ref,
                     dist_ref, idx_ref, *rest, d_dim: int, f_dim: int,
                     m_db: int, q_sub: int, q_grp: int):
    """One grid step = one query subtile of one pair.

    q_ref:    (q_sub, D)    this subtile's queries
    db_ref:   (F, m_db)     this pair's coordinate-major db + payload
    qbox_ref: (r8, 8)       SMEM this pair's per-GROUP bounds (row
                            t*G + g, G = q_sub // q_grp groups/subtile)
    bbox_ref: (rc8, 8)      SMEM this pair's per-chunk bounds (row c)
    qb_ref:   (r8, 1)       SMEM this pair's seeded prune bounds (per
                            group)
    outputs:  (q_sub, 1|f_dim)

    The prune test runs per (row group, chunk): a group's box spans
    1/G of the subtile's arc and its seeded bound maxes over q_grp
    rows only, so one far correspondence taxes its own group, not the
    whole subtile (the kernel is compute-bound, not step-bound — see
    benchmarks/profile_nn_pairs.py).

    SMEM tables are blocked PER PAIR with rows padded to a multiple of 8
    (Mosaic's blocked-sublane rule; padded rows are never read).
    """
    if f_dim:
        pay_ref, best_d, best_c, best_p = rest
    else:
        best_d, best_c = rest
    t = pl.program_id(1)
    n_chunks = m_db // 128
    n_grp = q_sub // q_grp
    eps = jnp.finfo(best_d.dtype).eps
    big = jnp.iinfo(jnp.int32).max

    q = q_ref[:]  # (q_sub, D)
    best_d[:] = jnp.full_like(best_d, jnp.inf)
    best_c[:] = jnp.zeros_like(best_c)
    if f_dim:
        best_p[:] = jnp.zeros_like(best_p)
    for g in range(n_grp):
        row = t * n_grp + g
        bound = qb_ref[row, 0]
        gsl = slice(g * q_grp, (g + 1) * q_grp)
        for c in range(n_chunks):
            lb = jnp.asarray(0.0, best_d.dtype)
            for k in range(d_dim):
                a = bbox_ref[c, k] - qbox_ref[row, 4 + k]
                b = qbox_ref[row, k] - bbox_ref[c, 4 + k]
                gap = jnp.maximum(jnp.maximum(a, b), 0.0)
                lb = lb + gap * gap
            # One-sided margin (same argument as _nn_pruned_kernel).
            lb = lb * (1.0 - 16.0 * eps)

            @pl.when(lb <= bound)
            def _work(c=c, g=g, gsl=gsl):
                sl = slice(c * 128, (c + 1) * 128)
                dist = jnp.zeros((q_grp, 128), dtype=best_d.dtype)
                for k in range(d_dim):
                    diff = q[gsl, k:k + 1] - db_ref[k:k + 1, sl]
                    dist = dist + diff * diff
                better = dist < best_d[gsl]  # strict: earlier chunk wins
                best_d[gsl] = jnp.where(better, dist, best_d[gsl])
                best_c[gsl] = jnp.where(better, c, best_c[gsl])
                if f_dim:
                    for f in range(f_dim):
                        fsl = slice(f * 128, (f + 1) * 128)
                        best_p[gsl, fsl] = jnp.where(
                            better, db_ref[d_dim + f:d_dim + f + 1, sl],
                            best_p[gsl, fsl],
                        )

    bd = best_d[:]  # (q_sub, 128)
    mn = jnp.min(bd, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
    gidx = best_c[:] * 128 + lane
    cand = jnp.where(bd == mn, gidx, big)
    winner = jnp.min(cand, axis=1, keepdims=True)
    dist_ref[:] = mn
    idx_ref[:] = winner
    if f_dim:
        one_hot = cand == winner
        for f in range(f_dim):
            pf = best_p[:, f * 128:(f + 1) * 128]
            pay_ref[:, f:f + 1] = jnp.sum(
                jnp.where(one_hot, pf, 0.0), axis=1, keepdims=True
            )


@functools.partial(
    jax.jit,
    static_argnames=("d_dim", "q_sub", "q_grp", "interpret"),
)
def _nn_pairs_impl(query, dbf_cm, q_bound, d_dim: int, q_sub: int,
                   q_grp: int, interpret: bool):
    """query: (B, Nq, D); dbf_cm: (B, F, M) sentinel-padded; q_bound:
    (B, Nq) with -inf on padded rows/pairs.  Nq % q_sub == 0,
    q_sub % q_grp == 0, M % 128 == 0."""
    b, n_q, _ = query.shape
    f_total, m_db = dbf_cm.shape[1], dbf_cm.shape[2]
    f_dim = f_total - d_dim
    n_qt = n_q // q_sub
    n_grp = n_q // q_grp  # prune-granularity rows (bounds per group)
    n_chunks = m_db // 128
    r8 = _round_up(n_grp, 8)
    rc8 = _round_up(n_chunks, 8)

    qbox = jax.vmap(lambda qq: _query_boxes(qq, q_grp))(query)
    bbox = jax.vmap(lambda cm: _tile_boxes(cm[:d_dim], 128))(dbf_cm)
    qb_sub = jnp.max(q_bound.reshape(b, n_grp, q_grp), axis=-1)

    q2 = query.reshape(b * n_q, d_dim)
    # Pad each pair's coordinate/payload rows to 8 (VMEM blocked-sublane
    # rule); the kernel only reads rows < f_total.
    f8 = _round_up(f_total, 8)
    db2 = jnp.pad(dbf_cm, ((0, 0), (0, f8 - f_total), (0, 0))).reshape(
        b * f8, m_db)
    qbox2 = jnp.pad(qbox, ((0, 0), (0, r8 - n_grp), (0, 0))).reshape(
        b * r8, 8)
    bbox2 = jnp.pad(bbox, ((0, 0), (0, rc8 - n_chunks), (0, 0))).reshape(
        b * rc8, 8)
    qb2 = jnp.pad(qb_sub, ((0, 0), (0, r8 - n_grp)))[..., None].reshape(
        b * r8, 1)

    kernel = functools.partial(
        _nn_pairs_kernel, d_dim=d_dim, f_dim=f_dim, m_db=m_db,
        q_sub=q_sub, q_grp=q_grp,
    )
    in_specs = [
        pl.BlockSpec((q_sub, d_dim), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((f8, m_db), lambda p, t: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r8, 8), lambda p, t: (p, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((rc8, 8), lambda p, t: (p, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((r8, 1), lambda p, t: (p, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((q_sub, 1), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_sub, 1), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * n_q, 1), query.dtype),
        jax.ShapeDtypeStruct((b * n_q, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((q_sub, 128), query.dtype),
        pltpu.VMEM((q_sub, 128), jnp.int32),
    ]
    if f_dim:
        out_specs.append(
            pl.BlockSpec((q_sub, f_dim), lambda p, t: (p * n_qt + t, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b * n_q, f_dim), query.dtype)
        )
        scratch.append(pltpu.VMEM((q_sub, 128 * f_dim), query.dtype))

    out = pl.pallas_call(
        kernel,
        grid=(b, n_qt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q2, db2, qbox2, bbox2, qb2)
    if f_dim:
        dist, idx, pay = out
        return (dist.reshape(b, n_q), idx.reshape(b, n_q),
                pay.reshape(b, n_q, f_dim))
    dist, idx = out
    return dist.reshape(b, n_q), idx.reshape(b, n_q), None


# --------------------------------------------------------------------------
# Survivor-list pairs kernel: the WARM-iteration variant of the pair grid.
#
# Same idea as _nn_list_kernel scaled down to many small dbs: the XLA
# pre-pass evaluates the bbox prune test for every (pair, subtile, chunk)
# at once and compacts each row's surviving chunk ids; the kernel walks
# exactly those chunks with one aligned dynamic (8, 128) vreg load per
# chunk from a per-pair chunk-sublane db.  Small dbs make this strictly
# simpler than the single-cloud list kernel: the list capacity is
# n_chunks itself (a 768-pt db is 6 chunks), so no row can ever overflow
# and there is NO full-sweep fallback branch.  Exactness argument is
# identical (one-sided-margin lower bound vs a true per-subtile upper
# bound; ascending ids + strict '<' preserve the lowest-index tie-break
# bit-for-bit).  The driver dispatches on warmth: the first ICP outer
# iteration (+inf bounds, nothing prunable) keeps the static-sweep
# kernel, every seeded iteration takes this one.
# --------------------------------------------------------------------------


def _nn_pairs_list_kernel(q_ref, db_ref, list_ref, cnt_ref, dist_ref,
                          idx_ref, *rest, d_dim: int, f_dim: int,
                          q_sub: int, q_grp: int, cap: int):
    """One grid step = one query subtile of one pair, walking exactly
    the chunks on the subtile's survivor list (production passes
    q_grp == q_sub: one full-height walk per step; the finer-group walk
    this supports measured slower — see nn_pallas_matched_pairs).

    q_ref:    (q_sub, D)      this subtile's queries
    db_ref:   (nc*8, 128)     this pair's chunk-sublane db (rows c*8+k =
                              coordinate/payload row k of chunk c)
    list_ref: (r8, cap) SMEM  this pair's survivor chunk ids (row
                              t*G + g, G = q_sub // q_grp groups per
                              subtile; tails padded with the row's first
                              id — idempotent under the strict-< carry)
    cnt_ref:  (r8, 1)   SMEM  survivor counts
    outputs:  (q_sub, 1|f_dim)
    """
    if f_dim:
        pay_ref, best_d, best_c, best_p = rest
    else:
        best_d, best_c = rest
    t = pl.program_id(1)
    n_grp = q_sub // q_grp
    big = jnp.iinfo(jnp.int32).max

    q = q_ref[:]  # (q_sub, D)
    best_d[:] = jnp.full_like(best_d, jnp.inf)
    best_c[:] = jnp.zeros_like(best_c)
    if f_dim:
        best_p[:] = jnp.zeros_like(best_p)

    for g in range(n_grp):
        row = t * n_grp + g
        gsl = slice(g * q_grp, (g + 1) * q_grp)
        cnt = cnt_ref[row, 0]

        def chunk(c, gsl=gsl):
            blk = db_ref[pl.ds(c * 8, 8), :]  # (8, 128): one vreg
            dist = jnp.zeros((q_grp, 128), dtype=best_d.dtype)
            for k in range(d_dim):
                diff = q[gsl, k:k + 1] - blk[k:k + 1, :]
                dist = dist + diff * diff
            better = dist < best_d[gsl]  # strict: ascending ids win ties
            best_d[gsl] = jnp.where(better, dist, best_d[gsl])
            best_c[gsl] = jnp.where(better, c, best_c[gsl])
            if f_dim:
                for f in range(f_dim):
                    fsl = slice(f * 128, (f + 1) * 128)
                    best_p[gsl, fsl] = jnp.where(
                        better, blk[d_dim + f:d_dim + f + 1, :],
                        best_p[gsl, fsl],
                    )

        def body(j, u, row=row, chunk=chunk):
            chunk(list_ref[row, 2 * j])
            chunk(list_ref[row, 2 * j + 1])
            return u

        jax.lax.fori_loop(0, (cnt + 1) // 2, body, 0)

    bd = best_d[:]  # (q_sub, 128)
    mn = jnp.min(bd, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
    gidx = best_c[:] * 128 + lane
    cand = jnp.where(bd == mn, gidx, big)
    winner = jnp.min(cand, axis=1, keepdims=True)
    dist_ref[:] = mn
    idx_ref[:] = winner
    if f_dim:
        one_hot = cand == winner
        for f in range(f_dim):
            pf = best_p[:, f * 128:(f + 1) * 128]
            pay_ref[:, f:f + 1] = jnp.sum(
                jnp.where(one_hot, pf, 0.0), axis=1, keepdims=True
            )


@functools.partial(
    jax.jit,
    static_argnames=("d_dim", "q_sub", "q_grp", "interpret"),
)
def _nn_pairs_list_impl(query, dbf_cm, q_bound, d_dim: int, q_sub: int,
                        q_grp: int, interpret: bool):
    """Survivor-list pairs sweep; same contract as _nn_pairs_impl (which
    documents the shapes).  Requires finite seeds to prune anything but
    is exact for any q_bound that upper-bounds each query's NN distance
    (+inf rows simply keep every chunk).

    The prune TEST runs per q_grp-query group (its box and seeded bound
    are tighter than the whole subtile's) but the kernel WALK stays per
    subtile: a chunk enters a subtile's list iff ANY of its groups
    needs it.  Group-granular WALKS measured slower (four quarter-
    height fori loops per step cost more than the visits they save —
    see nn_pallas_matched_pairs); the union test keeps the fast shape
    and prunes chunks that only the subtile-level max-bound kept."""
    b, n_q, _ = query.shape
    f_total, m_db = dbf_cm.shape[1], dbf_cm.shape[2]
    f_dim = f_total - d_dim
    n_qt = n_q // q_sub
    n_rows = n_q // q_grp  # prune-test rows per pair (groups)
    n_grp = q_sub // q_grp
    n_chunks = m_db // 128
    r8 = _round_up(n_qt, 8)
    cap = _round_up(n_chunks, 2)  # even: the kernel walks 2 per trip

    # XLA prune pre-pass: one (B, n_rows, nc) elementwise bound matrix.
    qt = query.reshape(b, n_rows, q_grp, d_dim)
    qlo = jnp.min(qt, axis=2)  # (B, n_rows, D)
    qhi = jnp.max(qt, axis=2)
    cbox = jax.vmap(lambda cm: _tile_boxes(cm[:d_dim], 128))(dbf_cm)
    a = cbox[:, None, :, :d_dim] - qhi[:, :, None, :]
    bb = qlo[:, :, None, :] - cbox[:, None, :, 4:4 + d_dim]
    g = jnp.maximum(jnp.maximum(a, bb), 0.0)
    lb = jnp.sum(g * g, axis=-1)  # (B, n_rows, nc)
    # One-sided margin (same argument as _nn_pruned_kernel).
    lb = lb * (1.0 - 16.0 * jnp.finfo(lb.dtype).eps)
    qbt = jnp.max(q_bound.reshape(b, n_rows, q_grp), axis=-1)
    ok = lb <= qbt[..., None]
    # Union the group tests into per-SUBTILE lists (the walk unit).
    ok = jnp.any(ok.reshape(b, n_qt, n_grp, n_chunks), axis=2)
    cnt = jnp.sum(ok, axis=-1).astype(jnp.int32)  # (B, n_qt)
    key = jnp.where(
        ok, jnp.arange(n_chunks, dtype=jnp.int32)[None, None, :],
        jnp.int32(n_chunks),
    )
    srt = jnp.sort(key, axis=-1)
    srt = jnp.pad(srt, ((0, 0), (0, 0), (0, cap - n_chunks)),
                  constant_values=n_chunks)
    pos = jnp.arange(cap, dtype=jnp.int32)[None, None, :]
    lists = jnp.where(pos < cnt[..., None], srt, srt[..., :1])

    # Per-pair chunk-sublane db: rows c*8+k hold row k of chunk c.
    f8 = 8
    db_sl = jnp.swapaxes(
        dbf_cm.reshape(b, f_total, n_chunks, 128), 1, 2
    )  # (B, nc, F, 128)
    db_sl = jnp.pad(db_sl, ((0, 0), (0, 0), (0, f8 - f_total), (0, 0)))
    db_sl = db_sl.reshape(b * n_chunks * f8, 128)

    q2 = query.reshape(b * n_q, d_dim)
    lists2 = jnp.pad(lists, ((0, 0), (0, r8 - n_qt), (0, 0))).reshape(
        b * r8, cap)
    cnt2 = jnp.pad(cnt, ((0, 0), (0, r8 - n_qt)))[..., None].reshape(
        b * r8, 1)

    kernel = functools.partial(
        _nn_pairs_list_kernel, d_dim=d_dim, f_dim=f_dim, q_sub=q_sub,
        q_grp=q_sub, cap=cap,
    )
    in_specs = [
        pl.BlockSpec((q_sub, d_dim), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_chunks * f8, 128), lambda p, t: (p, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r8, cap), lambda p, t: (p, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((r8, 1), lambda p, t: (p, 0),
                     memory_space=pltpu.SMEM),
    ]
    out_specs = [
        pl.BlockSpec((q_sub, 1), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((q_sub, 1), lambda p, t: (p * n_qt + t, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b * n_q, 1), query.dtype),
        jax.ShapeDtypeStruct((b * n_q, 1), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((q_sub, 128), query.dtype),
        pltpu.VMEM((q_sub, 128), jnp.int32),
    ]
    if f_dim:
        out_specs.append(
            pl.BlockSpec((q_sub, f_dim), lambda p, t: (p * n_qt + t, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b * n_q, f_dim), query.dtype)
        )
        scratch.append(pltpu.VMEM((q_sub, 128 * f_dim), query.dtype))

    out = pl.pallas_call(
        kernel,
        grid=(b, n_qt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(q2, db_sl, lists2, cnt2)
    if f_dim:
        dist, idx, pay = out
        return (dist.reshape(b, n_q), idx.reshape(b, n_q),
                pay.reshape(b, n_q, f_dim))
    dist, idx = out
    return dist.reshape(b, n_q), idx.reshape(b, n_q), None


def nn_pallas_matched_pairs(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    payload: Array | None = None,
    q_bound: Array | None = None,
    pair_blk: int = 8,
    q_sub: int = 256,
    q_grp: int | None = None,
    list_grp: int = 64,
    interpret: bool = False,
):
    """Batched many-pair exact 1-NN with matched payload: (B, Nq, D)
    queries vs (B, M, D) dbs in ONE pallas_call (see module section
    comment).  Returns (NNResult (B, Nq), matched (B, Nq, P)); same
    contract (incl. tie-breaks) as per-pair nn_pallas_matched.
    ``pair_blk`` is retained for API compatibility and unused: the
    round-3 kernel grids (pair, subtile) directly.

    Warmth dispatch (mirrors _nn_seeded_2d): with a q_bound, a lax.cond
    sends runs whose bounds are all +inf/-inf (the first ICP outer
    iteration) to the static-sweep kernel and every seeded run to the
    survivor-list kernel — bit-identical outputs either way.  The prune
    TEST runs per ``list_grp``-query group and the per-subtile list is
    the union of its groups' survivors.  Anti-result (round 3): group-
    granular WALKS prune more visits (census mean 3.2/6 at grp=64 vs
    5.0/6 at 256) yet measure SLOWER (1.60 vs 1.34 ms/sweep at 209x768)
    — four quarter-height (64, 128) fori walks per step cost more than
    the full-height visits they save — so only the TEST is fine-grained
    (benchmarks/profile_pairs_listgrp.py)."""
    del pair_blk
    if q_grp is None:
        q_grp = q_sub  # finer groups in the STATIC kernel measured
        # SLOWER (anti-result: 24 pl.when regions/step cost more than
        # the pruned compute; benchmarks/profile_nn_pairs.py round 3)
    b, n_q, d_dim = query.shape
    m = db.shape[1]
    if payload is None:
        payload = db
    f_dim = payload.shape[-1]

    b_pad = b
    q_pad = _round_up(n_q, q_sub)
    m_pad = _round_up(m, 128)

    sentinel = jnp.asarray(_SENTINEL, db.dtype)
    if db_mask is not None:
        db = jnp.where(db_mask[..., None], db, sentinel)
    db_p = jnp.pad(db, ((0, b_pad - b), (0, m_pad - m), (0, 0)),
                   constant_values=_SENTINEL)
    pay_p = jnp.pad(payload, ((0, b_pad - b), (0, m_pad - m), (0, 0)))
    dbf_cm = jnp.concatenate(
        [jnp.swapaxes(db_p, -1, -2), jnp.swapaxes(pay_p, -1, -2)], axis=1
    )  # (B, D+F, M)

    query_p = jnp.pad(query, ((0, b_pad - b), (0, q_pad - n_q), (0, 0)))
    if q_bound is None:
        qb = jnp.full((b, n_q), jnp.inf, query.dtype)
    else:
        qb = q_bound.astype(query.dtype)
    # Padded queries/pairs carry -inf bounds: their subtiles prune every
    # chunk and cost (almost) nothing.
    qb = jnp.pad(qb, ((0, b_pad - b), (0, q_pad - n_q)),
                 constant_values=-jnp.inf)

    if q_bound is None:
        dist, idx, pay = _nn_pairs_impl(
            query_p, dbf_cm, qb, d_dim, q_sub, q_grp, interpret
        )
    else:
        warm = jnp.any(jnp.isfinite(qb))

        def cold_fn(_):
            return _nn_pairs_impl(
                query_p, dbf_cm, qb, d_dim, q_sub, q_grp, interpret
            )

        def warm_fn(_):
            return _nn_pairs_list_impl(
                query_p, dbf_cm, qb, d_dim, q_sub,
                min(list_grp, q_sub), interpret
            )

        dist, idx, pay = jax.lax.cond(warm, warm_fn, cold_fn, None)
    dist = _trim_sentinel(dist[:b, :n_q])
    res = NNResult(index=idx[:b, :n_q], dist_sq=dist)
    return res, pay[:b, :n_q, :]
