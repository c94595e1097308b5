"""Surface normal estimation and batched k-NN.

No reference counterpart (the reference's 3D mode projects to 2D); required
by the point-to-plane config (BASELINE.json configs[1]).

k-NN uses the same tiled sweep as ops.nn with a (Q, k) running top-k carry;
normals are the smallest-eigenvalue eigenvector of each point's k-neighbor
covariance, oriented toward the sensor origin (LiDAR convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.ops.nn import _pad_axis


def knn_xla(
    query: Array,
    db: Array,
    k: int,
    db_mask: Array | None = None,
    tile: int = 2048,
):
    """Exact k-NN: returns (dists_sq (..., Q, k), idx (..., Q, k)),
    ascending by distance."""
    dtype = query.dtype
    d = query.shape[-1]
    m = db.shape[-2]
    if db_mask is None:
        db_mask = jnp.ones(db.shape[:-1], dtype=bool)
    tile = min(tile, max(m, 1))
    db_p = _pad_axis(db, -2, tile, 0.0)
    mask_p = _pad_axis(db_mask, -1, tile, False)
    n_tiles = db_p.shape[-2] // tile
    db_tiles = jnp.moveaxis(
        db_p.reshape(*db_p.shape[:-2], n_tiles, tile, d), -3, 0
    )
    mask_tiles = jnp.moveaxis(
        mask_p.reshape(*mask_p.shape[:-1], n_tiles, tile), -2, 0
    )
    inf = jnp.asarray(jnp.inf, dtype)
    best_d0 = jnp.full((*query.shape[:-1], k), jnp.inf, dtype=dtype)
    best_i0 = jnp.zeros((*query.shape[:-1], k), dtype=jnp.int32)

    def step(carry, tile_in):
        best_d, best_i = carry
        tile_db, tile_mask, tile_idx = tile_in
        dist = jnp.zeros((*query.shape[:-1], tile), dtype=dtype)
        for kk in range(d):
            diff = query[..., :, kk, None] - tile_db[..., None, :, kk]
            dist = dist + diff * diff
        dist = jnp.where(tile_mask[..., None, :], dist, inf)
        idx = (
            jnp.broadcast_to(
                jnp.arange(tile, dtype=jnp.int32), dist.shape
            )
            + tile_idx
        )
        cat_d = jnp.concatenate([best_d, dist], axis=-1)
        cat_i = jnp.concatenate([best_i, idx], axis=-1)
        neg_d, sel = jax.lax.top_k(-cat_d, k)
        new_d = -neg_d
        new_i = jnp.take_along_axis(cat_i, sel, axis=-1)
        return (new_d, new_i), None

    tile_offsets = jnp.arange(n_tiles, dtype=jnp.int32) * tile
    (best_d, best_i), _ = jax.lax.scan(
        step, (best_d0, best_i0), (db_tiles, mask_tiles, tile_offsets)
    )
    return best_d, best_i


def estimate_normals(
    points: Array,
    mask: Array,
    k: int = 8,
    tile: int = 2048,
    orient_to: Array | None = None,
):
    """Per-point unit normals from k-NN covariance PCA.

    points: (..., N, 3); mask: (..., N).  Returns (normals (..., N, 3),
    valid (..., N)) — invalid where fewer than 3 true neighbors exist or
    the neighborhood is degenerate.  Normals are oriented so that
    n . (orient_to - p) >= 0 (default orient_to = sensor origin).
    """
    dists, idx = knn_xla(points, points, k, mask, tile=tile)
    finite = jnp.isfinite(dists)  # (..., N, k)
    *batch, n_pts, dim = points.shape
    flat_idx = idx.reshape(*batch, n_pts * k)
    safe_idx = jnp.where(jnp.isfinite(dists).reshape(flat_idx.shape),
                         flat_idx, 0)
    nbrs = jnp.take_along_axis(
        points, safe_idx[..., None], axis=-2
    ).reshape(*batch, n_pts, k, dim)
    w = finite.astype(points.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=-2), 1.0)  # (..., N, 1)
    mean = jnp.sum(nbrs * w, axis=-2) / cnt
    cent = (nbrs - mean[..., None, :]) * w
    cov = jnp.einsum("...ki,...kj->...ij", cent, cent) / cnt[..., None]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    n = evecs[..., :, 0]  # smallest eigenvector
    if orient_to is None:
        orient_to = jnp.zeros(points.shape[-1], dtype=points.dtype)
    to_sensor = orient_to - points
    sign = jnp.sign(
        jnp.sum(n * to_sensor, axis=-1, keepdims=True)
    )
    n = n * jnp.where(sign == 0, 1.0, sign)
    valid = mask & (jnp.sum(finite, axis=-1) >= 3)
    return n, valid
