"""Grid-hash 1-NN: exact nearest neighbor within a capped radius.

The scan-to-submap correspondence kernel (BASELINE.json configs[3];
SURVEY.md §2.2 "grid-hash bucketing for scan-to-submap scale").  The
reference's KdTree (src/lib.rs:99,141) is exact and uncapped; production
scan matchers cap the correspondence distance anyway (a far match is an
outlier by construction), and the cap is what makes an O(N) TPU
formulation possible:

  build:  key every db point by its integer cell (cell edge = the search
          radius r), hash the cell to a table slot, sort points by slot,
          record per-slot start offsets (bincount + cumsum — no
          searchsorted, no pointer chasing).
  query:  a query in cell c can only have an in-radius neighbor in the
          3^D cells around c (any point outside is > r away in some
          axis).  Statically unroll the 3^D neighbor slots, gather each
          slot's first ``bucket_cap`` candidates from the sorted array,
          and take a masked argmin over all 3^D * bucket_cap candidates.

Everything is fixed-shape: sorting and gathers are dense XLA ops, so the
whole thing jits, vmaps, and shards.  Exactness contract: the returned
neighbor is the true 1-NN whenever that 1-NN lies STRICTLY within r AND
its bucket kept it (buckets overflowing ``bucket_cap`` drop the tail; build reports
the overflow fraction so callers can size the table).  Queries with no
in-radius neighbor return valid=False and must be masked out of the
solve (GN weights already take a mask).

Hash collisions are harmless for correctness: a colliding cell's points
land in the same bucket and simply become extra candidates that lose the
distance comparison — they only consume bucket capacity.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.ops.nn import NNResult

# Large odd multipliers (Teschner et al. spatial hashing constants).
_PRIMES = (73856093, 19349663, 83492791)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("points", "index", "starts", "counts", "cell_size",
                 "overflow_frac"),
    meta_fields=("table_size", "bucket_cap"),
)
@dataclasses.dataclass(frozen=True)
class HashGrid:
    """Device-resident spatial hash over one point cloud.

    table_size/bucket_cap are STATIC pytree metadata (they shape the
    query's unrolled candidate fetch), so a HashGrid crosses jit
    boundaries without tracing them.
    """

    points: Array        # (M, D) sorted by slot
    index: Array         # (M,) original db index per sorted row
    starts: Array        # (T + 1,) slot -> first row in `points`
    counts: Array        # (T,) points per slot
    cell_size: Array     # () the search radius r
    overflow_frac: Array  # () fraction of points beyond bucket_cap in
                          # their slot (diagnostic; 0.0 = fully exact)
    table_size: int = 1 << 14
    bucket_cap: int = 16  # candidates kept per slot at query time; the
                          # overflow diagnostic is computed for THIS cap


def _hash_cells(cells: Array, table_size: int) -> Array:
    """cells: (..., D) int32 -> (...,) slot in [0, table_size)."""
    h = cells[..., 0] * _PRIMES[0]
    for k in range(1, cells.shape[-1]):
        h = h ^ (cells[..., k] * _PRIMES[k])
    # Cheap avalanche so consecutive cells spread across the table.
    h = h ^ (h >> 13)
    return jnp.abs(h) % table_size


@functools.partial(jax.jit, static_argnames=("table_size", "bucket_cap"))
def build_grid(
    db: Array,
    db_mask: Array,
    cell_size,
    table_size: int = 1 << 14,
    bucket_cap: int = 16,
) -> HashGrid:
    """db: (M, D); db_mask: (M,). cell_size = the query radius r."""
    m, d = db.shape
    assert d <= len(_PRIMES), "grid hash supports D<=3"
    cell_size = jnp.asarray(cell_size, db.dtype)
    cells = jnp.floor(db / cell_size).astype(jnp.int32)
    slot = _hash_cells(cells, table_size)
    slot = jnp.where(db_mask, slot, table_size)  # invalid -> overflow slot

    order = jnp.argsort(slot, stable=True)
    slot_s = slot[order]
    pts_s = db[order]
    idx_s = order.astype(jnp.int32)

    counts = jnp.zeros((table_size + 1,), jnp.int32).at[slot].add(1)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[:-1], dtype=jnp.int32)]
    )  # (T + 1,)

    n_valid = jnp.maximum(jnp.sum(db_mask), 1)
    overflow = jnp.sum(
        jnp.maximum(counts[:-1] - bucket_cap, 0)
    ).astype(db.dtype) / n_valid.astype(db.dtype)

    return HashGrid(
        points=pts_s,
        index=idx_s,
        starts=starts,
        counts=counts[:-1],
        cell_size=cell_size,
        table_size=table_size,
        bucket_cap=bucket_cap,
        overflow_frac=overflow,
    )


def _neighbor_offsets(d: int) -> Array:
    """(3^D, D) int32 offsets in {-1, 0, 1}^D."""
    import itertools

    import numpy as np

    return jnp.asarray(
        list(itertools.product((-1, 0, 1), repeat=d)), jnp.int32
    )


@functools.partial(jax.jit, static_argnames=("bucket_cap",))
def nn_gridhash(
    query: Array,
    grid: HashGrid,
    bucket_cap: int | None = None,
) -> NNResult:
    """query: (Q, D) -> NNResult with +inf dist_sq where nothing in radius.

    index is 0 (a safe gatherable value) where invalid — always AND the
    caller's weight mask with ``dist_sq < inf``.  bucket_cap defaults to
    the grid's own cap, so the build-time overflow diagnostic describes
    exactly what the query truncates.
    """
    if bucket_cap is None:
        bucket_cap = grid.bucket_cap
    q, d = query.shape
    r = grid.cell_size
    cells = jnp.floor(query / r).astype(jnp.int32)  # (Q, D)
    offs = _neighbor_offsets(d)  # (C, D), C = 3^D
    c = offs.shape[0]

    ncells = cells[:, None, :] + offs[None, :, :]  # (Q, C, D)
    slots = _hash_cells(ncells, grid.table_size)  # (Q, C)
    start = grid.starts[slots]  # (Q, C)
    cnt = grid.counts[slots]  # (Q, C)

    # Candidate rows: (Q, C, K) into the sorted point array.
    k_iota = jnp.arange(bucket_cap, dtype=jnp.int32)
    rows = start[..., None] + k_iota  # (Q, C, K)
    valid = k_iota < cnt[..., None]  # (Q, C, K)
    rows = jnp.where(valid, rows, 0)

    flat = rows.reshape(q, c * bucket_cap)  # (Q, CK)
    cand = grid.points[flat]  # (Q, CK, D)
    diff = cand - query[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)  # (Q, CK)
    # Strict '<': the 3^D neighbor-cell sweep only guarantees coverage for
    # distance < r (a point at EXACTLY r can sit outside the neighborhood
    # on an axis), so the filter must match or equally-distant candidates
    # would be returned inconsistently (ADVICE r1).
    vmask = valid.reshape(q, c * bucket_cap) & (d2 < r * r)
    d2 = jnp.where(vmask, d2, jnp.inf)

    # Lowest-original-index tie-break to match ops.nn: argmin over
    # (d2, original index) lexicographically.
    orig = grid.index[flat]  # (Q, CK)
    best = jnp.min(d2, axis=-1)  # (Q,)
    is_best = d2 == best[:, None]
    big = jnp.iinfo(jnp.int32).max
    idx = jnp.min(jnp.where(is_best & vmask, orig, big), axis=-1)
    found = jnp.isfinite(best)
    return NNResult(
        index=jnp.where(found, idx, 0).astype(jnp.int32),
        dist_sq=best,
    )
