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


def _nn_kernel(q_ref, db_ref, dbm_ref, dist_ref, idx_ref, d_dim: int,
               db_tile: int, n_db_tiles: int):
    """One (query-tile, db-tile) grid step.

    q_ref:   (TQ, D)   queries
    db_ref:  (D, TD)   db tile, coordinate-major
    dbm_ref: (1, TD)   db validity (float 0/1)
    dist_ref/idx_ref: (TQ, 1) running best (squared distance / global index)
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dist_ref[:] = jnp.full_like(dist_ref, jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    q = q_ref[:]  # (TQ, D)
    dist = jnp.zeros((q.shape[0], db_tile), dtype=dist_ref.dtype)
    for k in range(d_dim):
        diff = q[:, k:k + 1] - db_ref[k:k + 1, :]  # (TQ, TD)
        dist = dist + diff * diff
    valid = dbm_ref[0:1, :] > 0.5  # (1, TD)
    dist = jnp.where(valid, dist, jnp.inf)

    # Lowest-index argmin within the tile: argmin of (dist, index) lexicographic.
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    tile_min = jnp.min(dist, axis=1, keepdims=True)  # (TQ, 1)
    cand = jnp.where(dist == tile_min, col, db_tile)
    tile_arg = jnp.min(cand, axis=1, keepdims=True)  # (TQ, 1)
    tile_idx = (tile_arg + j * db_tile).astype(jnp.int32)

    better = tile_min < dist_ref[:]  # strict: earlier tiles win ties
    dist_ref[:] = jnp.where(better, tile_min, dist_ref[:])
    idx_ref[:] = jnp.where(better, tile_idx, idx_ref[:])


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
