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

from icp_rust_tpu.ops import linalg
from icp_rust_tpu.ops.nn import _pad_axis

# Planarity gate threshold on the mid/largest eigenvalue ratio.  The
# closed-form f32 eigensolver's error floor is ~2e-4 relative to lam2
# (measured on rank-1 covariances), so the gate must sit well above it:
# at 1e-4, 12% of exactly-collinear f32 voxels passed as "planar".
# Real planes have lam1/lam2 = O(1), so 2e-3 costs nothing.
_PLANARITY_EPS = 2e-3


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
    return _pca_normals_from_knn(points, mask, dists, idx, orient_to)


def _pca_normals_from_knn(points, mask, dists, idx, orient_to):
    finite = jnp.isfinite(dists)  # (..., N, k)
    *batch, n_pts, dim = points.shape
    k = idx.shape[-1]
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
    evals, n = linalg.sym3x3_eigh_smallest(cov)  # closed form, no eigh
    if orient_to is None:
        orient_to = jnp.zeros(points.shape[-1], dtype=points.dtype)
    to_sensor = orient_to - points
    sign = jnp.sign(
        jnp.sum(n * to_sensor, axis=-1, keepdims=True)
    )
    n = n * jnp.where(sign == 0, 1.0, sign)
    # Degenerate (collinear / duplicate-point) neighborhoods have no
    # well-defined plane: gate on the eigenvalue ratio like the voxel
    # path (the closed-form solver's contract requires it).
    planar = evals[..., 1] > _PLANARITY_EPS * jnp.maximum(
        evals[..., 2], jnp.finfo(points.dtype).tiny
    )
    valid = mask & (jnp.sum(finite, axis=-1) >= 3) & planar
    return n, valid


def estimate_normals_voxel(
    points: Array,
    mask: Array,
    voxel_size: float,
    capacity: int = 1 << 15,
    orient_to: Array | None = None,
    min_points: int = 3,
    planarity_eps: float = _PLANARITY_EPS,
):
    """Per-point unit normals from per-VOXEL covariance PCA — the
    production-fast path (the VGICP formulation: one sorted segment-sum
    pass instead of an O(N^2) k-NN; ~300x faster at 28k points on TPU).

    Every point inherits the normal of its voxel's neighborhood
    statistics.  points: (N, 3); mask: (N,).  Returns (normals (N, 3),
    valid (N,)); invalid where the voxel has < min_points members, was
    dropped by capacity, lies outside the 1024-cells-per-axis index box
    (points farther than 1024*voxel_size from the cloud minimum), or is
    degenerate: voxels whose neighborhood is near-collinear (mid
    covariance eigenvalue < planarity_eps * largest) have no well-defined
    plane and are flagged invalid rather than returning an arbitrary
    eigenvector.
    """
    n_pts, dim = points.shape
    dtype = points.dtype
    big = jnp.iinfo(jnp.int32).max

    lo = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    cells = jnp.floor((points - lo) / voxel_size).astype(jnp.int32)
    # Out-of-box points are INVALID, not clipped: clipping would alias
    # everything beyond 1024 cells into the border voxel and blend
    # far-apart surfaces into one "valid" plane.
    in_box = jnp.all((cells >= 0) & (cells < 1024), axis=-1)
    cells = jnp.clip(cells, 0, 1023)
    cell_id = cells[:, 0]
    for kk in range(1, dim):
        cell_id = cell_id * 1024 + cells[:, kk]
    cell_id = jnp.where(mask & in_box, cell_id, big)

    # Moments accumulate in PER-VOXEL LOCAL coordinates: with global
    # coordinates, E[x^2] - mean^2 at |x| ~ 20 m and voxel-scale spread
    # cancels catastrophically in f32 (~1% covariance noise — enough to
    # defeat the planarity gate on collinear data).  The covariance is
    # translation-invariant, so subtracting each point's own cell corner
    # changes nothing mathematically and keeps |coords| <= voxel_size.
    local = points - (lo + cells.astype(dtype) * voxel_size)

    order = jnp.argsort(cell_id)
    sid = cell_id[order]
    spts = local[order]
    svalid = sid != big
    first = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    first = first & svalid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(svalid, jnp.clip(seg, 0, capacity), capacity)

    wf = svalid.astype(dtype)[:, None]
    # second moments, packed (xx, yy, zz, xy, xz, yz)
    m2 = jnp.stack(
        [spts[:, 0] * spts[:, 0], spts[:, 1] * spts[:, 1],
         spts[:, 2] * spts[:, 2], spts[:, 0] * spts[:, 1],
         spts[:, 0] * spts[:, 2], spts[:, 1] * spts[:, 2]], axis=-1,
    )
    # ONE fused (N, 10) scatter-add for count + first + second moments:
    # three separate scatters measured 0.72 ms vs 0.24 fused at 28.8k
    # points (round 3) — TPU scatter cost is per-op, not per-lane.  The
    # segment ids are ascending by construction (cumsum of run starts).
    acc = jnp.zeros((capacity + 1, 7 + dim), dtype).at[seg].add(
        jnp.concatenate([wf, spts * wf, m2 * wf], axis=-1),
        indices_are_sorted=True,
    )
    cnt = acc[:, 0]
    s1 = acc[:, 1:1 + dim]
    s2 = acc[:, 1 + dim:7 + dim]

    c = jnp.maximum(cnt[:capacity], 1.0)
    mean = s1[:capacity] / c[:, None]
    xx = s2[:capacity, 0] / c - mean[:, 0] * mean[:, 0]
    yy = s2[:capacity, 1] / c - mean[:, 1] * mean[:, 1]
    zz = s2[:capacity, 2] / c - mean[:, 2] * mean[:, 2]
    xy = s2[:capacity, 3] / c - mean[:, 0] * mean[:, 1]
    xz = s2[:capacity, 4] / c - mean[:, 0] * mean[:, 2]
    yz = s2[:capacity, 5] / c - mean[:, 1] * mean[:, 2]
    cov = jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], -2)  # (capacity, 3, 3)
    # Closed-form symmetric 3x3 (jnp.linalg.eigh is a custom call that
    # measured ~13 ms for this capacity on TPU — 40% of a p2l frame).
    evals, vox_n = linalg.sym3x3_eigh_smallest(cov)
    # Planarity gate: a plane has two spread directions (lam1, lam2 > 0);
    # a collinear neighborhood has lam1 ~ lam2-relative zero and its
    # smallest eigenvector is arbitrary within the normal plane.
    planar = evals[:, 1] > planarity_eps * jnp.maximum(
        evals[:, 2], jnp.finfo(dtype).tiny
    )
    vox_ok = (cnt[:capacity] >= min_points) & planar

    # scatter voxel normals back to the ORIGINAL point order; points in
    # voxels dropped by capacity (seg >= capacity) are INVALID, not
    # silently mapped to another voxel's plane.  Validity rides the
    # normals as a 4th f32 lane so each step is ONE 4-lane gather —
    # gathering the bool arrays separately cost 2x ~0.22 ms per 28.8k
    # points on TPU (packed-pred gathers are the slowest kind; round-5
    # device trace of the p2l bench).
    in_range = seg < capacity
    pt_seg_sorted = jnp.clip(seg, 0, capacity - 1)
    packed = jnp.concatenate(
        [vox_n, vox_ok.astype(dtype)[:, None]], axis=-1
    )  # (capacity, 4)
    pt_sorted = packed[pt_seg_sorted]  # (N, 4)
    okf_sorted = (pt_sorted[:, 3:4]
                  * (svalid & in_range).astype(dtype)[:, None])
    pt_sorted = jnp.concatenate([pt_sorted[:, :3], okf_sorted], axis=-1)
    inv = jnp.zeros((n_pts,), jnp.int32).at[order].set(
        jnp.arange(n_pts, dtype=jnp.int32)
    )
    out = pt_sorted[inv]  # (N, 4)
    normals = out[:, :3]
    valid = (out[:, 3] > 0.5) & mask

    if orient_to is None:
        orient_to = jnp.zeros(dim, dtype=dtype)
    sign = jnp.sign(jnp.sum(normals * (orient_to - points), axis=-1,
                            keepdims=True))
    normals = normals * jnp.where(sign == 0, 1.0, sign)
    return normals, valid
