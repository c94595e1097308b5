"""Voxel-grid downsampling with fixed output capacity.

No reference counterpart; needed by the scan-to-submap config
(BASELINE.json configs[3]).  TPU-native formulation: no dense grid is ever
materialized — points are keyed by their integer cell coordinates (clipped
to 1024 per axis so the linear id fits int32), sorted by id, and reduced to
per-voxel centroids with a fixed-size scatter-add.  Everything is
fixed-shape + masked, so it jits and vmaps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

_MAX_CELLS_PER_AXIS = 1024


class VoxelResult(NamedTuple):
    points: Array  # (capacity, D) voxel centroids (zeros where invalid)
    mask: Array    # (capacity,) validity
    n_cells: Array  # () int32: occupied voxel count BEFORE truncation —
                    # if > capacity, cells were dropped (in cell-id order)
                    # and callers should grow capacity


def voxel_downsample(
    points: Array,
    mask: Array,
    voxel_size: float,
    capacity: int,
) -> VoxelResult:
    """points: (N, D); mask: (N,).  Returns up to ``capacity`` voxel
    centroids.  Voxels beyond capacity (in cell-id order) are dropped;
    callers size capacity generously.
    """
    n, d = points.shape
    dtype = points.dtype
    maskf = mask.astype(dtype)

    lo = jnp.min(jnp.where(mask[:, None], points, jnp.inf), axis=0)
    cells = jnp.clip(
        jnp.floor((points - lo) / voxel_size).astype(jnp.int32),
        0,
        _MAX_CELLS_PER_AXIS - 1,
    )
    cell_id = cells[:, 0]
    for k in range(1, d):
        cell_id = cell_id * _MAX_CELLS_PER_AXIS + cells[:, k]
    big = jnp.iinfo(jnp.int32).max
    cell_id = jnp.where(mask, cell_id, big)

    order = jnp.argsort(cell_id)
    sid = cell_id[order]
    spts = points[order]
    svalid = sid != big

    first = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]]
    ) & svalid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment index per point
    seg = jnp.where(svalid, seg, capacity)  # invalid -> dumped in overflow row

    acc = jnp.zeros((capacity + 1, d), dtype=dtype)
    cnt = jnp.zeros((capacity + 1,), dtype=dtype)
    seg_c = jnp.clip(seg, 0, capacity)
    acc = acc.at[seg_c].add(spts * svalid[:, None].astype(dtype))
    cnt = cnt.at[seg_c].add(svalid.astype(dtype))
    out_mask = cnt[:capacity] > 0
    centroids = acc[:capacity] / jnp.maximum(cnt[:capacity, None], 1.0)
    centroids = jnp.where(out_mask[:, None], centroids, 0.0)
    n_cells = jnp.sum(first.astype(jnp.int32))
    return VoxelResult(points=centroids, mask=out_mask, n_cells=n_cells)
