"""Scan-to-scan ICP drivers (2D, and 3D with planar motion).

Behavioral parity with reference src/lib.rs:

- ``icp2d`` = Icp2d::estimate (src/lib.rs:91-131): exactly ``outer_iters``
  iterations (the reference has NO outer convergence test), each doing
  (1) transform all src points by the current T, (2) exact 1-NN of each
  into dst, (3) ``estimate_transform`` on (transformed src, matched dst),
  (4) left-compose T <- dT o T.  The KdTree build has no analogue — the
  tiled sweep needs no index structure.
- ``icp3d_planar`` = Icp3d::estimate (src/lib.rs:133-174): correspondences
  found in 3D, optimization on the xy projection only, z untouched
  (transform_xy, src/lib.rs:52-57; get_xy, src/lib.rs:86-89).

The outer loop is a ``lax.scan`` of static length, so a whole ICP call jits
to a single XLA program.  Point clouds are fixed-shape with validity masks
(ragged scans are padded by utils.io).

Scale preconditioning: all coordinates are divided by config.point_scale on
entry and the result's translation is rescaled on exit.  With huber_k
co-scaled (done inside ops.align2d) this is mathematically exact — it only
changes floating-point conditioning, which is what float32 TPU runs need on
mm-scale data (config.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import (
    build_db_pack,
    nearest_neighbor,
    nearest_neighbor_matched,
    spatial_order,
    use_pairs_nn,
    use_pallas_nn,
)


def _scaled(x: Array, config: ICPConfig) -> Array:
    if config.point_scale == 1.0:
        return x
    return x / jnp.asarray(config.point_scale, x.dtype)


def _scale_transform(t: RigidTransform2, s: float) -> RigidTransform2:
    return RigidTransform2(rot=t.rot, t=t.t / s) if s != 1.0 else t


def _unscale_transform(t: RigidTransform2, s: float) -> RigidTransform2:
    return RigidTransform2(rot=t.rot, t=t.t * s) if s != 1.0 else t


def _sort_enabled(src, dst, config: ICPConfig):
    """Spatial pre-sort policy (config.nn_sort).  Sorting the point axis
    is what makes the pruned Pallas kernels' bbox pruning spatially
    tight; it permutes reduction order only (the GN solve is a sum over
    pairs), so results differ from the unsorted run at f32 roundoff at
    most.  The f64 parity path stays unsorted via the backend gate.

    Returns the sort method to use ("morton" | "azimuth") or None.
    "auto" resolves to Morton: Z-order buckets are compact 2D patches,
    so the chunk-granular survivor-list kernel prunes ~7x more than
    under azimuth sectors (ops/nn.morton_order docstring)."""
    if config.nn_sort in ("azimuth", "morton"):
        return config.nn_sort
    if config.nn_sort != "auto":
        return None
    # The pair-grid batched kernel prunes at 128-point chunk
    # granularity, so sorting pays for any db above a few chunks
    # ("auto" dispatches batched small-db calls to it on TPU — the
    # same use_pairs_nn gate as ops/nn.nearest_neighbor_matched).
    if use_pairs_nn(src, dst, config.nn_backend, config.nn_method):
        return "morton" if dst.shape[-2] >= 3 * 128 else None
    # Sorting only pays when the db spans enough tiles for the kernel's
    # bbox pruning to bite (nn_pallas skips pruning below 3 tiles).
    ok = (
        dst.shape[-2] >= 3 * config.nn_dst_tile
        and use_pallas_nn(src, dst, config.nn_backend, config.nn_method)
    )
    return "morton" if ok else None


def _spatial_sort(points, mask, extras=(), method: str = "morton"):
    """Sort the point axis spatially (masked points last).  extras are
    per-point arrays permuted alongside ((..., N, K) or (..., N)).

    The permuted mask is rebuilt as ``arange < n_valid`` instead of
    gathered: both sort methods key masked points with a sentinel
    strictly above every valid key (+inf azimuth / INT32_MAX Morton
    code), so the stable argsort puts exactly the valid points first —
    bit-identical to gathering the mask, minus a packed-bool gather
    that the round-5 device trace priced at ~0.22 ms per 28.8k-point
    frame (TPU gathers are per-element; packed-pred worst of all)."""
    order = spatial_order(points, mask, method)
    pts = jnp.take_along_axis(points, order[..., None], axis=-2)
    n_valid = jnp.sum(mask, axis=-1, keepdims=True, dtype=jnp.int32)
    msk = jnp.arange(mask.shape[-1], dtype=jnp.int32) < n_valid
    out = []
    for e in extras:
        if e.ndim == pts.ndim:
            out.append(jnp.take_along_axis(e, order[..., None], axis=-2))
        else:
            out.append(jnp.take_along_axis(e, order, axis=-1))
    return pts, msk, out


def presort_src(src, src_mask, dst, config: ICPConfig):
    """Hoist the drivers' loop-invariant src sort out of a sequence loop.

    The odometry runners keep frame 0 as the fixed src forever
    (reference examples/scan2d.rs:65,88), yet each per-frame driver call
    re-sorts it — inside the fused ``lax.scan`` that is one redundant
    28.8k argsort+gather per frame (XLA does not hoist sorts out of the
    while loop; the round-3 device trace showed both per-frame argsorts).

    Returns ``(src, src_mask, presorted)``.  The permutation is computed
    on the same scaled view the drivers sort (scaling is elementwise, so
    scale-after-permute == permute-after-scale), making a driver call
    with ``src_presorted=True`` bitwise-identical to the in-driver sort.
    ``dst`` is consulted for the sort policy only (shapes/backend).
    """
    sort = _sort_enabled(src, dst, config)
    if not sort:
        return src, src_mask, False
    view = _scaled(src.astype(config.compute_dtype), config)
    order = spatial_order(view, src_mask, sort)
    src = jnp.take_along_axis(src, order[..., None], axis=-2)
    src_mask = jnp.take_along_axis(src_mask, order, axis=-1)
    return src, src_mask, True


def _broadcast_db(src, dst, dst_mask):
    """Broadcast a shared db to a batched src's batch shape.

    ``icp2d(src=(B, N, D), dst=(M, D))`` means "match every scan in the
    batch against the same map" — every downstream path (spatial sort,
    pack, frame kernels) expects src and dst to carry the same batch
    rank, so materialize the shared db per lane here (scans are small in
    this regime; the batched drivers pass per-pair dbs and skip this)."""
    if dst.ndim >= src.ndim:
        return dst, dst_mask
    batch = src.shape[:src.ndim - dst.ndim]
    dst = jnp.broadcast_to(dst, batch + dst.shape)
    dst_mask = jnp.broadcast_to(dst_mask, batch + dst_mask.shape)
    return dst, dst_mask


def _use_frame_kernel(src, dst, config: ICPConfig,
                      return_stats: bool):
    """Gate for the whole-frame fused kernels (config.frame_backend):
    small f32 2D scans on TPU (or forced interpret mode for tests).
    The kernels' unpruned (M, 128) distance blocks cap the db size —
    exactly the regime where the unfused path is launch/glue-bound.
    Returns None, "single" (one scan pair, one launch) or "pairs"
    (batched: one pair per grid step, outer loops desynchronized)."""
    if config.frame_backend == "off" or return_stats:
        return None
    if not (src.ndim in (2, 3) and src.shape[-1] == 2
            and src.dtype == jnp.float32
            and dst.ndim == src.ndim
            and (src.ndim == 2 or dst.shape[0] == src.shape[0])
            and src.shape[-2] <= config.frame_kernel_max
            and dst.shape[-2] <= config.frame_kernel_max):
        return None
    kind = "single" if src.ndim == 2 else "pairs"
    if config.frame_backend == "interpret":
        return kind
    # "auto" takes the SINGLE-frame kernel only: the pair-grid variant
    # measured 1,210 pairs/s vs the lockstep pipeline's ~3,500 at
    # 209x768 — sacrificing the pair-vectorized IRLS (64 pairs share
    # every radix pass) costs ~3x more than the per-outer launches it
    # saves (docs/DESIGN.md round-4).  frame_backend="pairs" forces it
    # (useful for small batches / the record).
    if (config.align_backend == "pallas"
            and jax.default_backend() == "tpu"):
        if config.frame_backend == "auto" and kind == "single":
            return kind
        if config.frame_backend == "pairs":
            return kind
    return None


def _is_identity(dt):
    """Per-batch-lane: is dt EXACTLY the identity (bitwise)?  Works for
    any rigid transform (SE(2) or SE(3)) via the rotation's size."""
    eye = jnp.eye(dt.rot.shape[-1], dtype=dt.rot.dtype)
    return jnp.all(dt.rot == eye, axis=(-2, -1)) & jnp.all(
        dt.t == 0.0, axis=-1
    )


def _outer_fixed_point(step, t0, max_iters: int, aux0=None,
                       return_aux: bool = False, first_step=None):
    """Run the outer ICP loop with an EXACT fixed-point early exit.

    The reference runs exactly ``max_iter`` outer iterations with no
    convergence test (src/lib.rs:112-128).  But ICP's outer iteration is a
    deterministic function of T alone: if one iteration returns
    dT == identity bitwise, then T is unchanged, so every subsequent
    iteration recomputes the identical correspondences and the identical
    inner solve and returns identity again.  Exiting there is therefore
    *bit-exact* with running all ``max_iter`` iterations — the inner loop
    discards a first-step |delta|^2 < 1e-6 update (lib.rs:71-73), which is
    what produces an exactly-identity dT at convergence.  Batched lanes
    simply stop changing once their dT is identity, so the loop exits when
    ALL lanes have hit their fixed point (or at max_iters).

    With ``aux0`` the loop threads an auxiliary carry through ``step``
    (used for the NN prune-bound: last iteration's distances).  The aux
    only ever affects PRUNING (bit-identical NN results), so the
    fixed-point argument is unchanged.

    ``return_aux=True`` additionally returns the final aux — the last
    executed iteration's correspondence data.  When the loop exited via
    the fixed point (dT == identity, the steady-state case) that data is
    EXACTLY the correspondence set at the returned transform, so callers
    can compute final-transform stats without another NN sweep
    (VERDICT r2 weak #6); on a max_iters exit it is one outer iteration
    stale.

    ``first_step`` peels iteration 1 OUT of the while loop: it runs once
    unconditionally (max_iters >= 1 always holds here) and the loop
    continues from its result.  Callers pass a cold-variant closure
    (static cold-seed NN dispatch) so the loop body traces only the warm
    path — the round-5 device trace priced the in-loop warmth lax.cond
    at ~0.04 ms/outer (branch materialization + boundary copies).
    Identical iteration-for-iteration results; aux0 required.
    """

    if aux0 is not None:
        def cond_a(carry):
            _, it, fixed, _ = carry
            return (it < max_iters) & ~jnp.all(fixed)

        def body_a(carry):
            t, it, _, aux = carry
            t_next, fixed, aux_next = step(t, aux)
            return (t_next, it + 1, fixed, aux_next)

        if first_step is not None and max_iters >= 1:
            t1, fixed1, aux1 = first_step(t0, aux0)
            init = (t1, 1, fixed1, aux1)
        else:
            init = (t0, 0, jnp.zeros(t0.t.shape[:-1], bool), aux0)
        t, it, _, aux = jax.lax.while_loop(cond_a, body_a, init)
        if return_aux:
            return t, it, aux
        return t, it

    def cond(carry):
        _, it, fixed = carry
        return (it < max_iters) & ~jnp.all(fixed)

    def body(carry):
        t, it, _ = carry
        t_next, fixed = step(t)
        return (t_next, it + 1, fixed)

    t, it, _ = jax.lax.while_loop(
        cond, body, (t0, 0, jnp.zeros(t0.t.shape[:-1], bool))
    )
    return t, it


class ICPStats(NamedTuple):
    """Per-call observability (SURVEY.md §5), computed with ONE extra NN
    pass at the final transform when requested (``return_stats=True``).

    Units: ``mean_nn_dist`` is in PHYSICAL units (point_scale undone);
    ``huber_error`` is the robust objective in solver (scaled) units, the
    quantity the reference's inner loop monitors (src/lib.rs:75-79)."""

    outer_iters: Array       # (...,) int32 (shared across batch lanes:
                             # the while_loop exits when ALL lanes fix)
    huber_error: Array       # (...,)
    mean_nn_dist: Array      # (...,)
    inlier_fraction: Array   # (...,) fraction of pairs with IRLS weight 1


def _stats_2d(src_t, matched, mask, config, dist_sq, it):
    """Final-transform metrics from the last correspondence set."""
    from icp_rust_tpu.ops import huber

    s = config.point_scale
    maskf = mask.astype(src_t.dtype)
    nf = jnp.maximum(jnp.sum(maskf, axis=-1), 1.0)
    r = src_t[..., :2] - matched[..., :2]
    k = config.huber_k / s
    err = jnp.sum(
        huber.rho(jnp.sum(r * r, axis=-1), k) * maskf, axis=-1
    )
    # IRLS weight is drho(r_ij^2, k) == 1 iff |r_ij| <= k per dimension
    # (align2d.weighted_gauss_newton_update) — sigma enters the solve as
    # a separate scale, not the weight.
    inl = jnp.all(jnp.abs(r) <= k, axis=-1)
    mean_nn = jnp.sum(
        jnp.sqrt(jnp.maximum(dist_sq, 0.0)) * maskf, axis=-1
    ) / nf * s
    return ICPStats(
        outer_iters=jnp.broadcast_to(it, err.shape).astype(jnp.int32),
        huber_error=err,
        mean_nn_dist=mean_nn,
        inlier_fraction=jnp.sum(inl * maskf, axis=-1) / nf,
    )


def icp2d(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig = ICPConfig(),
    return_stats: bool = False,
    src_presorted: bool = False,
):
    """2D scan-to-scan ICP. src/dst: (..., N|M, 2); masks over the point axes.

    Parity: reference Icp2d::estimate (src/lib.rs:105-130).
    With ``return_stats`` returns (transform, ICPStats).
    ``src_presorted``: src already permuted by :func:`presort_src`
    (sequence runners hoist the loop-invariant sort; bitwise-identical).
    """
    s = config.point_scale
    src = _scaled(src.astype(config.compute_dtype), config)
    dst = _scaled(dst.astype(config.compute_dtype), config)
    t0 = _scale_transform(
        initial_transform.astype(config.compute_dtype), s
    )
    dst, dst_mask = _broadcast_db(src, dst, dst_mask)
    frame_kind = _use_frame_kernel(src, dst, config, return_stats)
    if frame_kind:
        # Whole frame in ONE kernel launch (small-scan fast path): the
        # unsorted db order matches the reference's tie-break directly,
        # and no sort/pack/prune-bound glue is needed at all.  Batched
        # calls take the pair-grid variant: one pair per grid step,
        # each running its own outer loop to ITS fixed point.
        from icp_rust_tpu.ops import align2d_pallas

        fn = (align2d_pallas.icp2d_frame_pallas
              if frame_kind == "single"
              else align2d_pallas.icp2d_frame_pallas_pairs)
        rot, t, _ = fn(
            src, dst, src_mask, dst_mask, t0.rot, t0.t,
            huber_k=config.huber_k / s,
            det_rel_eps=config.det_rel_eps,
            tol_d2=config.inner_delta_sq_tol,
            inner_max_iter=config.inner_max_iter,
            outer_iters=config.outer_iters,
            point_scale=s,
            interpret=config.frame_backend == "interpret",
        )
        return _unscale_transform(RigidTransform2(rot, t), s)
    sort = _sort_enabled(src, dst, config)
    if sort:
        # Once per call (outer iterations reuse the order: a rigid motion
        # preserves spatial clustering, so tile locality persists).
        if not src_presorted:
            src, src_mask, _ = _spatial_sort(src, src_mask, method=sort)
        dst, dst_mask, _ = _spatial_sort(dst, dst_mask, method=sort)
    # KdTree-build analogue (src/lib.rs:97-102): pack the db ONCE per
    # call — the kernel's chunk-sublane relayout is loop-invariant but
    # XLA does not hoist it out of the outer while_loop (round-4 trace:
    # ~675 tiny ops per outer iteration).  Bit-identical results.
    db_pack = build_db_pack(src, dst, dst_mask,
                            backend=config.nn_backend,
                            tile=config.nn_dst_tile,
                            method=config.nn_method)

    def make_outer(warm):
        # ``warm`` statically picks the seeded NN kernel's cold/warm
        # branch: iteration 1 is peeled out of the while loop (cold,
        # runs once), the loop body traces the warm path only — no
        # in-loop lax.cond.  Bit-identical results either way.
        def outer(t, aux):
            prev_d2, prev_q = aux[0], aux[1]
            src_t = t.apply_points(src)
            # Valid NN upper bound: the db is fixed across outer
            # iterations, so dist_new(q) <= dist_prev(q) + |Δq| — seeds
            # the kernel's prune threshold (results stay bit-identical).
            # The sqrt/square round trip can round 1-3 ulp BELOW
            # prev_d2; inflate by 32 eps so the bound stays a true
            # upper bound in floating point.
            move = jnp.linalg.norm(src_t - prev_q, axis=-1)
            ulp = 1.0 + 32.0 * jnp.finfo(src.dtype).eps
            qb = (jnp.sqrt(prev_d2) + move) ** 2 * ulp
            res, matched = nearest_neighbor_matched(
                src_t, dst, dst_mask, backend=config.nn_backend,
                tile=config.nn_dst_tile, method=config.nn_method,
                q_tile=config.nn_query_tile, q_bound=qb,
                db_pack=db_pack, warm=warm,
            )
            dt = align2d.estimate_transform(src_t, matched, src_mask,
                                            config)
            aux_next = (res.dist_sq, src_t)
            if return_stats:
                aux_next = aux_next + (matched,)
            return dt.compose(t), _is_identity(dt), aux_next
        return outer

    outer, outer_cold = make_outer(True), make_outer(False)
    aux0 = (
        jnp.full(src.shape[:-1], jnp.inf, src.dtype),
        src,
    )
    if return_stats:
        # Stats reuse the last outer iteration's correspondences from the
        # aux carry — exact at the returned transform whenever the
        # fixed-point exit fired (the steady-state case), no extra sweep.
        aux0 = aux0 + (jnp.zeros_like(src),)
        t, it, aux = _outer_fixed_point(
            outer, t0, config.outer_iters, aux0, return_aux=True,
            first_step=outer_cold,
        )
        dist_sq, src_t, matched = aux
        stats = _stats_2d(src_t, matched, src_mask, config, dist_sq, it)
        return _unscale_transform(t, s), stats
    t, it = _outer_fixed_point(outer, t0, config.outer_iters, aux0,
                               first_step=outer_cold)
    return _unscale_transform(t, s)


def icp3d_planar(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig = ICPConfig(),
    return_stats: bool = False,
    src_presorted: bool = False,
):
    """3D matching, SE(2)-on-xy optimization (vehicle on the xy-plane).

    src/dst: (..., N|M, 3).  Parity: reference Icp3d::estimate
    (src/lib.rs:148-173): 1-NN in full 3D, solve on the xy projections,
    z passes through the transform untouched.  ``src_presorted``: src
    already permuted by :func:`presort_src` (bitwise-identical hoist).
    """
    s = config.point_scale
    src = _scaled(src.astype(config.compute_dtype), config)
    dst = _scaled(dst.astype(config.compute_dtype), config)
    t0 = _scale_transform(
        initial_transform.astype(config.compute_dtype), s
    )
    dst, dst_mask = _broadcast_db(src, dst, dst_mask)
    sort = _sort_enabled(src, dst, config)
    if sort:
        if not src_presorted:
            src, src_mask, _ = _spatial_sort(src, src_mask, method=sort)
        dst, dst_mask, _ = _spatial_sort(dst, dst_mask, method=sort)

    def transform_xy(t: RigidTransform2, pts: Array) -> Array:
        xy = t.apply_points(pts[..., :2])
        return jnp.concatenate([xy, pts[..., 2:]], axis=-1)

    # The SE(2) solve consumes only the matched point's xy, so the NN
    # payload carries 2 lanes, not the full 3D point (each payload lane
    # adds a select per 128-chunk to the kernel's hot loop).
    payload_xy = dst[..., :2]
    # Per-call KdTree-build analogue — see icp2d.
    db_pack = build_db_pack(src, dst, dst_mask, payload=payload_xy,
                            backend=config.nn_backend,
                            tile=config.nn_dst_tile,
                            method=config.nn_method)

    def make_outer(warm):
        # Static cold/warm NN dispatch + iteration-1 peel — see icp2d.
        def outer(t, aux):
            prev_d2, prev_xy = aux[0], aux[1]
            src_t = transform_xy(t, src)  # (..., N, 3)
            # Queries move only in xy (z passes through), so
            # |Δq| = |Δxy|; dist_prev + |Δq| bounds the new NN distance
            # (db fixed) and seeds the kernel's prune threshold —
            # bit-identical results.  32-eps inflation keeps it an
            # upper bound under f32 rounding.
            move = jnp.linalg.norm(src_t[..., :2] - prev_xy, axis=-1)
            ulp = 1.0 + 32.0 * jnp.finfo(src.dtype).eps
            qb = (jnp.sqrt(prev_d2) + move) ** 2 * ulp
            res, matched_xy = nearest_neighbor_matched(
                src_t, dst, dst_mask, payload=payload_xy,
                backend=config.nn_backend, tile=config.nn_dst_tile,
                method=config.nn_method, q_tile=config.nn_query_tile,
                q_bound=qb, db_pack=db_pack, warm=warm,
            )
            dt = align2d.estimate_transform(
                src_t[..., :2], matched_xy, src_mask, config
            )
            aux_next = (res.dist_sq, src_t[..., :2])
            if return_stats:
                aux_next = aux_next + (matched_xy,)
            return dt.compose(t), _is_identity(dt), aux_next
        return outer

    outer, outer_cold = make_outer(True), make_outer(False)
    aux0 = (
        jnp.full(src.shape[:-1], jnp.inf, src.dtype),
        src[..., :2],
    )
    if return_stats:
        # Last-iteration correspondences from the aux carry — exact at
        # the returned transform on a fixed-point exit, no extra sweep.
        aux0 = aux0 + (jnp.zeros_like(src[..., :2]),)
        t, it, aux = _outer_fixed_point(
            outer, t0, config.outer_iters, aux0, return_aux=True,
            first_step=outer_cold,
        )
        dist_sq, src_xy, matched_xy = aux
        stats = _stats_2d(src_xy, matched_xy, src_mask, config,
                          dist_sq, it)
        return _unscale_transform(t, s), stats
    t, it = _outer_fixed_point(outer, t0, config.outer_iters, aux0,
                               first_step=outer_cold)
    return _unscale_transform(t, s)
