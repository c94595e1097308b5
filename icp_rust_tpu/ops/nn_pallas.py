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


def _nn_kernel(q_ref, db_ref, dbm_ref, dist_ref, idx_ref, best_d, best_i,
               d_dim: int, db_tile: int, n_db_tiles: int):
    """One (query-tile, db-tile) grid step with DEFERRED argmin.

    The naive kernel reduces (TQ, TD) -> (TQ, 1) min+argmin on every db
    tile: the min pass, the dist==min compare, and the masked index-min
    are three extra sweeps of the distance tile, most of it cross-lane
    reduction work the VPU hates.  Instead keep per-LANE running minima:
    a (TQ, 128) carry where lane L tracks the best over all db columns
    congruent to L (mod 128).  Per 128-column chunk the update is one
    compare + two selects — pure elementwise, no reductions — and the
    single cross-lane reduction happens once per query tile in the
    epilogue.

    q_ref:   (TQ, D)   queries
    db_ref:  (D, TD)   db tile, coordinate-major
    dbm_ref: (1, TD)   db validity (float 0/1)
    dist_ref/idx_ref: (TQ, 1) final output (written on the last db tile)
    best_d/best_i: (TQ, 128) VMEM scratch carries
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, jnp.inf)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]  # (TQ, D)
    tq = q.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, 128), 1)
    for c in range(db_tile // 128):
        sl = slice(c * 128, (c + 1) * 128)
        dist = jnp.zeros((tq, 128), dtype=best_d.dtype)
        for k in range(d_dim):
            diff = q[:, k:k + 1] - db_ref[k:k + 1, sl]  # (TQ, 128)
            dist = dist + diff * diff
        valid = dbm_ref[0:1, sl] > 0.5
        dist = jnp.where(valid, dist, jnp.inf)
        gidx = lane + (j * db_tile + c * 128)
        better = dist < best_d[:]  # strict: earlier chunks win ties
        best_d[:] = jnp.where(better, dist, best_d[:])
        best_i[:] = jnp.where(better, gidx, best_i[:])

    @pl.when(j == n_db_tiles - 1)
    def _epilogue():
        bd = best_d[:]  # (TQ, 128)
        m = jnp.min(bd, axis=1, keepdims=True)  # (TQ, 1)
        big = jnp.iinfo(jnp.int32).max
        cand = jnp.where(bd == m, best_i[:], big)
        dist_ref[:] = m
        idx_ref[:] = jnp.min(cand, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("q_tile", "db_tile", "interpret")
)
def _nn_pallas_2d(
    query: Array,
    db_cm: Array,
    db_mask: Array,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
):
    """query: (Q, D); db_cm: (D, M) coordinate-major; db_mask: (1, M) float."""
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
            pl.BlockSpec((1, db_tile), lambda i, j: (0, j),
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
    )(query, db_cm, db_mask)
    return dist[:, 0], idx[:, 0]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def nn_pallas(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    q_tile: int = 256,
    db_tile: int = 512,
    interpret: bool = False,
) -> NNResult:
    """Exact 1-NN via the Pallas kernel; same contract as ops.nn.nn_xla.

    Handles padding to tile multiples and arbitrary leading batch dims
    (vmapped over the kernel).
    """
    *batch, q, d_dim = query.shape
    m = db.shape[-2]
    if db_mask is None:
        db_mask = jnp.ones((*db.shape[:-1],), dtype=bool)

    q_pad = _round_up(q, q_tile)
    m_pad = _round_up(m, db_tile)
    pad_q = [(0, 0)] * (query.ndim - 2) + [(0, q_pad - q), (0, 0)]
    pad_m = [(0, 0)] * (db.ndim - 2) + [(0, m_pad - m), (0, 0)]
    query_p = jnp.pad(query, pad_q)
    db_p = jnp.pad(db, pad_m)
    mask_p = jnp.pad(
        db_mask, [(0, 0)] * (db_mask.ndim - 1) + [(0, m_pad - m)]
    )

    db_cm = jnp.swapaxes(db_p, -1, -2)  # (..., D, M)
    maskf = mask_p[..., None, :].astype(query.dtype)  # (..., 1, M)

    fn = functools.partial(
        _nn_pallas_2d, q_tile=q_tile, db_tile=db_tile, interpret=interpret
    )
    for _ in batch:
        fn = jax.vmap(fn)
    dist, idx = fn(query_p, db_cm, maskf)
    return NNResult(
        index=idx[..., :q], dist_sq=dist[..., :q]
    )
