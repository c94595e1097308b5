"""Exact 1-nearest-neighbor correspondence search.

TPU-native replacement for the reference's KdTree dependency
(tier4/nearest_neighbor_rust; used at src/lib.rs:99,121,141,164 with
leaf_size=1 and exact 1-NN semantics).  A KD-tree's pointer-chasing is the
wrong shape for a vector machine; instead the database is swept in fixed
tiles with a running (best-distance, best-index) carry — O(Q*M) but
entirely dense VPU work that XLA/Mosaic pipeline from HBM at full
bandwidth (SURVEY.md §2.2: "the single most important kernel of the
build").

Distances use the direct squared-difference form, NOT the
|s|^2+|d|^2-2 s.d matmul trick: with D=2..3 the MXU win is nil and the
cancellation error (~|p|^2 * eps) would corrupt argmin ordering in f32 on
mm-scale scans.

Tie-break: lowest database index (within a tile jnp.argmin takes the first
occurrence; across tiles the carry update is strict '<', so earlier tiles
win).  The reference KdTree's tie order is unknown, so cross-impl parity
on ties is ATE-level, not bitwise (SURVEY.md §7.4).

Backends:
- ``nn_xla``: lax.scan over database tiles; works on any platform.
- ``nn_pallas`` (ops/nn_pallas.py): hand-tiled VMEM kernel for TPU.
``nearest_neighbor`` dispatches per config.nn_backend.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class NNResult(NamedTuple):
    index: Array    # (..., Q) int32 — argmin into the database axis
    dist_sq: Array  # (..., Q) squared distance (+inf where db fully masked)


def _pad_axis(x: Array, axis: int, multiple: int, value):
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


def nn_xla(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    tile: int = 2048,
    method: str = "direct",
) -> NNResult:
    """Tiled brute-force exact 1-NN.

    query: (..., Q, D); db: (..., M, D); db_mask: (..., M) or None.
    Returns int32 indices into the M axis and squared distances.

    method:
      - "direct": per-coordinate squared differences on the VPU.  No
        cancellation beyond input rounding — the parity-exact choice.
      - "mxu": |q|^2 + |d|^2 - 2 q.d with the cross term as an MXU matmul
        (f32 accumulate).  ~an order of magnitude faster at >=10k points,
        at the cost of ~|p|^2*eps absolute distance error, which can flip
        argmin between near-tied neighbors; for ICP that is equivalent to
        one extra point-spacing of correspondence noise.  Center/scale
        data first (config.point_scale) to keep |p| = O(1).
    """
    dtype = query.dtype
    q, d = query.shape[-2], query.shape[-1]
    m = db.shape[-2]
    if db_mask is None:
        db_mask = jnp.ones(db.shape[:-1], dtype=bool)

    tile = min(tile, max(m, 1))
    db_p = _pad_axis(db, -2, tile, 0.0)
    mask_p = _pad_axis(db_mask, -1, tile, False)
    m_pad = db_p.shape[-2]
    n_tiles = m_pad // tile

    # (..., n_tiles, tile, D) / (..., n_tiles, tile); scan over axis 0 of a
    # moved copy so the batch dims stay put.
    db_tiles = jnp.moveaxis(
        db_p.reshape(*db_p.shape[:-2], n_tiles, tile, d), -3, 0
    )
    mask_tiles = jnp.moveaxis(
        mask_p.reshape(*mask_p.shape[:-1], n_tiles, tile), -2, 0
    )

    inf = jnp.asarray(jnp.inf, dtype)
    best_d0 = jnp.full((*query.shape[:-1],), jnp.inf, dtype=dtype)
    best_i0 = jnp.zeros(query.shape[:-1], dtype=jnp.int32)
    if method == "mxu":
        q_sq = jnp.sum(query * query, axis=-1)  # (..., Q)

    def step(carry, tile_in):
        best_d, best_i = carry
        tile_db, tile_mask, tile_idx = tile_in
        if method == "mxu":
            # (..., Q, tile) = |q|^2 + |d|^2 - 2 q.d — cross term on the MXU.
            db_sq = jnp.sum(tile_db * tile_db, axis=-1)  # (..., tile)
            # HIGHEST: 6-pass bf16 on the MXU (~f32 accuracy).  The default
            # 1-pass bf16 truncates coordinates to 8 mantissa bits, which
            # scrambles argmin (measured 45% index agreement at 28k pts).
            cross = jnp.einsum(
                "...qk,...tk->...qt", query, tile_db,
                preferred_element_type=dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            dist = q_sq[..., :, None] + db_sq[..., None, :] - 2.0 * cross
        else:
            # (..., Q, tile): direct squared differences, D unrolled.
            dist = jnp.zeros((*query.shape[:-1], tile), dtype=dtype)
            for k in range(d):
                diff = query[..., :, k, None] - tile_db[..., None, :, k]
                dist = dist + diff * diff
        dist = jnp.where(tile_mask[..., None, :], dist, inf)
        local_d = jnp.min(dist, axis=-1)
        local_i = jnp.argmin(dist, axis=-1).astype(jnp.int32) + tile_idx
        better = local_d < best_d  # strict: earlier tile wins ties
        return (
            jnp.where(better, local_d, best_d),
            jnp.where(better, local_i, best_i),
        ), None

    tile_offsets = (jnp.arange(n_tiles, dtype=jnp.int32) * tile)
    (best_d, best_i), _ = jax.lax.scan(
        step, (best_d0, best_i0), (db_tiles, mask_tiles, tile_offsets)
    )
    return NNResult(index=best_i, dist_sq=best_d)


def azimuth_order(points: Array, mask: Array | None = None) -> Array:
    """Permutation sorting points by azimuth atan2(y, x), masked points
    last.

    Spatial pre-sort for the pruned Pallas kernel (ops/nn_pallas.py):
    tile-level bbox pruning only bites when memory-adjacent points are
    spatially adjacent.  Real LiDAR packets are already angularly ordered
    (reference examples/scan3d.rs reads the sensor stream in azimuth
    order); this restores that property for arbitrarily-ordered clouds.
    Angular sectors around the sensor give tight per-tile boxes for
    single-scan data.  O(N log N) once per cloud vs the O(N*M) sweep it
    accelerates 20x per ICP call (outer iterations reuse the order).
    """
    az = jnp.arctan2(points[..., 1], points[..., 0])
    if mask is not None:
        az = jnp.where(mask, az, jnp.inf)
    return jnp.argsort(az, axis=-1).astype(jnp.int32)


def _spread_bits10(v: Array) -> Array:
    """Interleave-ready bit spread of a 10-bit int32: abcdefghij ->
    a0b0c0d0e0f0g0h0i0j (Morton component)."""
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def morton_order(points: Array, mask: Array | None = None) -> Array:
    """Permutation sorting points along a 2D Morton (Z-order) curve on
    (x, y), masked points last.

    Alternative spatial pre-sort to :func:`azimuth_order` for the pruned
    Pallas kernels.  Azimuth sectors make long thin boxes that all meet
    near the sensor, so fine-grained bbox pruning saturates (round-3
    measurement: p50 60/225 surviving 128-pt chunks per query tile);
    Z-order buckets are COMPACT 2D patches and the same bound test leaves
    p50 8/225.  The z coordinate (when present) is ignored for ordering —
    LiDAR scenes are z-thin — but still bounds distances via the chunk
    boxes.  Like the azimuth sort this only permutes the point axis
    (f32 reduction order); exactness of the NN result is unaffected.
    """
    x, y = points[..., 0], points[..., 1]

    def _q10(v):
        lo = jnp.min(v, axis=-1, keepdims=True)
        hi = jnp.max(v, axis=-1, keepdims=True)
        t = (v - lo) / jnp.maximum(hi - lo, jnp.asarray(1e-30, v.dtype))
        return jnp.clip((t * 1023.0).astype(jnp.int32), 0, 1023)

    code = _spread_bits10(_q10(x)) | (_spread_bits10(_q10(y)) << 1)
    if mask is not None:
        code = jnp.where(mask, code, jnp.iinfo(jnp.int32).max)
    # Stable sort keeps masked points' relative order deterministic.
    return jnp.argsort(code, axis=-1, stable=True).astype(jnp.int32)


def spatial_order(points: Array, mask: Array | None = None,
                  method: str = "morton") -> Array:
    """Dispatch to the configured spatial pre-sort (config.nn_sort)."""
    if method == "azimuth":
        return azimuth_order(points, mask)
    if method == "morton":
        return morton_order(points, mask)
    raise ValueError(f"unknown spatial sort method: {method!r}")


def _compiled_mosaic_f64(query: Array) -> bool:
    """True when this call would hit COMPILED Mosaic with f64 data —
    an unsupported combination (TPU has no f64 vector unit; the
    lowering dies in a convert-element-type recursion).  The f64
    reference path belongs on the XLA sweep, which emulates f64
    correctly; interpret-mode Pallas (CPU tests) keeps f64."""
    if query.dtype != jnp.float64:
        return False
    try:
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.available()
    except ImportError:  # pragma: no cover
        return True


def use_pallas_nn(query: Array, db: Array, backend: str = "auto",
                  method: str = "direct") -> bool:
    """Trace-time resolution of the single-cloud NN backend dispatch
    (batched small-db MATCHED calls dispatch to the pair-grid kernel
    via use_pairs_nn before this gate is consulted)."""
    if _compiled_mosaic_f64(query):
        return False
    if backend == "pallas":
        return True
    if backend != "auto" or method != "direct":
        return False
    # The Pallas kernel computes direct distances only ("mxu" falls
    # through to the XLA path), and it wins for big single clouds; for
    # BATCHED small clouds (multi-pair ICP) the vmapped kernel grid-izes
    # per pair and the fused XLA sweep measures ~25% faster (1.9k vs
    # 1.5k pairs/s at 209x768 on v5e).
    batched_small = query.ndim > 2 and db.shape[-2] <= 4096
    try:
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.available() and not batched_small
    except ImportError:  # pragma: no cover
        return False


def use_pairs_nn(query: Array, db: Array, backend: str = "auto",
                 method: str = "direct") -> bool:
    """Trace-time dispatch for the pair-grid batched kernel
    (nn_pallas_matched_pairs): explicit "pairs", or "auto" on TPU for a
    batched direct call (shared by nearest_neighbor_matched and the
    drivers' pre-sort decision so the two always agree)."""
    if query.ndim != 3:
        return False
    if _compiled_mosaic_f64(query):
        return False
    if backend == "pairs":
        return True
    if backend != "auto" or method != "direct":
        return False
    # "auto" takes it only in the measured many-small-pairs regime; a
    # batched call with big dbs keeps the vmapped single-cloud kernel
    # (whole-db-per-pair VMEM residency is unproven past this size).
    if db.shape[-2] > 4096:
        return False
    try:
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.available()
    except ImportError:  # pragma: no cover
        return False


def nearest_neighbor(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    backend: str = "auto",
    tile: int = 2048,
    method: str = "direct",
    q_tile: int = 512,
) -> NNResult:
    """Dispatching entry point; see module docstring.

    "auto" resolves to the Pallas deferred-argmin kernel on TPU and the
    XLA sweep elsewhere.  Profiling (benchmarks/profile_overhead2.py +
    an XLA device trace) showed nn_xla's per-tile min/argmin lowers to
    an iota+reduce fusion costing ~75 us per (28800, 512) tile — 93% of
    the whole ICP program's device time — while the Pallas kernel's
    per-lane carry replaces every per-tile argmin with elementwise
    compare+select; with azimuth-sorted clouds its bbox tile-pruning
    runs the full 28800^2 sweep in ~0.5 ms (benchmarks/
    profile_nn_prune.py).
    """
    if use_pallas_nn(query, db, backend, method):
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.nn_pallas(query, db, db_mask, q_tile=q_tile,
                                   db_tile=tile)
    return nn_xla(query, db, db_mask, tile=tile, method=method)


def build_db_pack(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    payload: Array | None = None,
    backend: str = "auto",
    tile: int = 2048,
    method: str = "direct",
):
    """Per-frame NN index build — the KdTree::new analogue (reference
    src/lib.rs:97-102 builds its tree once per frame; here the analogous
    loop-invariant work is the Pallas kernels' chunk-sublane db relayout
    + per-chunk boxes, which XLA does NOT hoist out of the ICP outer
    while_loop).  Returns a ``nn_pallas.PackedDB`` when the seeded
    single-cloud Pallas path would serve (query, db)-shaped matched
    calls, else None; pass the result to nearest_neighbor_matched as
    ``db_pack`` — results are bit-identical."""
    if query.ndim != 2:
        return None
    if use_pairs_nn(query, db, backend, method):
        return None
    if not use_pallas_nn(query, db, backend, method):
        return None
    d_dim = db.shape[-1]
    p = payload.shape[-1] if payload is not None else d_dim
    if d_dim + p > 8:
        return None
    m_pad = -(-db.shape[-2] // tile) * tile
    if m_pad // tile < 3:
        return None  # pruning disabled at <3 tiles; no seeded path
    from icp_rust_tpu.ops import nn_pallas

    return nn_pallas.pack_db(db, db_mask, payload, db_tile=tile)


def nearest_neighbor_matched(
    query: Array,
    db: Array,
    db_mask: Array | None = None,
    payload: Array | None = None,
    backend: str = "auto",
    tile: int = 2048,
    method: str = "direct",
    q_tile: int = 512,
    q_bound: Array | None = None,
    db_pack=None,
    warm: bool | None = None,
):
    """1-NN that also returns the winner's payload (default: the matched
    db point), replacing the caller's post-hoc take_along_axis gather —
    TPU dynamic gathers at 28k rows cost as much as the pruned distance
    sweep itself.  Returns (NNResult, matched (..., Q, P)).

    ``warm`` statically selects the seeded Pallas path's cold/warm
    branch (True = survivor-list only, False = cold-seed only, None =
    runtime cond); exactness never depends on it — see
    nn_pallas._nn_seeded_2d.  Ignored by the XLA and pair-grid paths."""
    if query.ndim == 3 and use_pairs_nn(query, db, backend, method):
        # Pair-grid batched kernel: one pallas_call for MANY small pairs
        # (multi-pair ICP) — on "auto" this is the TPU default for a
        # batched SEEDED call: the survivor-list warm path beats the
        # fused XLA sweep (1.34 vs 1.95 ms/outer at 209x768), which
        # cannot use q_bound at all.  Exact, seeded-prune; see
        # nn_pallas.nn_pallas_matched_pairs.  (The vmapped single-cloud
        # kernel stays out: narrow windows waste scoped VMEM and its
        # per-pair grid overhead dominates.)
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.nn_pallas_matched_pairs(
            query, db, db_mask, payload=payload, q_bound=q_bound,
            interpret=not nn_pallas.available(),
        )
    if use_pallas_nn(query, db, backend, method):
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.nn_pallas_matched(
            query, db, db_mask, payload=payload, q_tile=q_tile,
            db_tile=tile, q_bound=q_bound, db_pack=db_pack, warm=warm,
        )
    res = nn_xla(query, db, db_mask, tile=tile, method=method)
    if payload is None:
        payload = db
    matched = jnp.take_along_axis(payload, res.index[..., None], axis=-2)
    return res, matched
