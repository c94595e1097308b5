"""Ring-pass exact 1-NN over a device-sharded destination cloud.

The sequence-parallel correspondence kernel (SURVEY.md §2.3, §5): the
destination cloud is sharded over the mesh axis; each step every device
searches the resident shard, folds the result into a running
(best-distance, best global index) carry, and ``ppermute``s the shard to
its ring neighbor.  After axis_size steps every device has seen the whole
cloud while only ever holding 1/n of it — structurally ring attention with
an argmin carry instead of softmax accumulation, riding ICI neighbor links.

Runs inside ``shard_map`` (see parallel/sharded.py and tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array, lax

from icp_rust_tpu.ops.nn import NNResult, nn_xla


def _resolve_backend(backend: str) -> str:
    """'auto' -> 'pallas' on a TPU backend, 'xla' elsewhere.

    The per-shard search inside the ring is the same hot 1-NN sweep as the
    single-device path: on TPU it MUST run the Pallas deferred-argmin
    kernel, not nn_xla, whose per-tile argmin lowers to the iota+reduce
    fusion measured at ~75 us per (28800, 512) tile / 93% of device time
    (VERDICT r1 #2: the ring re-introduced exactly that).  This is a
    Python-level (trace-time) decision, valid inside shard_map.
    """
    if backend != "auto":
        return backend
    try:
        from icp_rust_tpu.ops import nn_pallas

        return "pallas" if nn_pallas.available() else "xla"
    except ImportError:  # pragma: no cover
        return "xla"


def _shard_nn(query, db, dbm, backend: str, tile: int) -> NNResult:
    if backend == "pallas":
        from icp_rust_tpu.ops import nn_pallas

        return nn_pallas.nn_pallas(query, db, dbm, db_tile=tile)
    return nn_xla(query, db, dbm, tile=tile)


def ring_nearest_neighbor(
    query: Array,
    db_shard: Array,
    db_shard_mask: Array,
    axis_name: str,
    tile: int = 2048,
    backend: str = "auto",
) -> NNResult:
    """query: (Q, D) local queries; db_shard: (M_local, D) this device's
    destination shard; mask over it.  Returns global indices into the
    unsharded (axis-concatenated) destination cloud.
    """
    backend = _resolve_backend(backend)
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    m_local = db_shard.shape[-2]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    best_d = jnp.full(query.shape[:-1], jnp.inf, dtype=query.dtype)
    best_i = jnp.zeros(query.shape[:-1], dtype=jnp.int32)

    def fold(best_d, best_i, db, dbm, owner):
        res = _shard_nn(query, db, dbm, backend, tile)
        gidx = res.index + owner * m_local
        # Strict '<' keeps the earlier owner on exact ties; to reproduce the
        # single-device lowest-global-index tie-break we additionally prefer
        # the lower owner index on equality.
        better = (res.dist_sq < best_d) | (
            (res.dist_sq == best_d) & (gidx < best_i)
        )
        return (
            jnp.where(better, res.dist_sq, best_d),
            jnp.where(better, gidx, best_i),
        )

    def step(i, carry):
        best_d, best_i, db, dbm = carry
        # After i forward rotations, the resident shard originated at
        # (my - i) mod n_dev.
        owner = (my - i) % n_dev
        best_d, best_i = fold(best_d, best_i, db, dbm, owner)
        db = lax.ppermute(db, axis_name, perm)
        dbm = lax.ppermute(dbm, axis_name, perm)
        return (best_d, best_i, db, dbm)

    best_d, best_i, db, dbm = lax.fori_loop(
        0, n_dev - 1, step, (best_d, best_i, db_shard, db_shard_mask)
    )
    owner = (my - (n_dev - 1)) % n_dev
    best_d, best_i = fold(best_d, best_i, db, dbm, owner)
    return NNResult(index=best_i, dist_sq=best_d)


def ring_nearest_neighbor_matched(
    query: Array,
    db_shard: Array,
    db_shard_mask: Array,
    axis_name: str,
    tile: int = 2048,
    backend: str = "auto",
    payload: Array | None = None,
):
    """Ring 1-NN that also carries the winner's PAYLOAD through the ring.

    ``payload`` (M_local, P) is an arbitrary per-db-point feature row
    (default: the db point itself); it rides the ppermute carry exactly
    like the coordinates, so e.g. the p2l driver's [normal, plane-offset]
    rows never need the unsharded destination.

    Returns (NNResult, matched (Q, P)).  The winner's coordinates fold
    into the carry alongside (distance, index), so callers never need the
    unsharded destination cloud — the all_gather + global take_along_axis
    that ring_nearest_neighbor callers otherwise do (which re-replicates
    the very array the sharding was supposed to split) disappears.  Peak
    per-device memory stays O(M/n) for the destination axis.

    On TPU the per-shard search is the payload-carrying Pallas kernel
    (nn_pallas_matched), which also eliminates the per-shard
    take_along_axis gather — at 28k rows that gather costs more than the
    whole distance sweep.
    """
    backend = _resolve_backend(backend)
    n_dev = lax.axis_size(axis_name)
    my = lax.axis_index(axis_name)
    m_local = db_shard.shape[-2]
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    # With an explicit payload the feature rows ride the ring alongside
    # the coordinates; with the default (db points) the coordinates ARE
    # the payload, so nothing extra is permuted.
    has_payload = payload is not None
    p_dim = payload.shape[-1] if has_payload else db_shard.shape[-1]
    p_dtype = payload.dtype if has_payload else query.dtype

    best_d = jnp.full(query.shape[:-1], jnp.inf, dtype=query.dtype)
    best_i = jnp.zeros(query.shape[:-1], dtype=jnp.int32)
    best_p = jnp.zeros((*query.shape[:-1], p_dim), dtype=p_dtype)

    def fold(best_d, best_i, best_p, db, dbm, pay, owner):
        if backend == "pallas":
            from icp_rust_tpu.ops import nn_pallas

            res, matched = nn_pallas.nn_pallas_matched(
                query, db, dbm, payload=pay, db_tile=tile
            )
        else:
            res = nn_xla(query, db, dbm, tile=tile)
            matched = jnp.take_along_axis(
                db if pay is None else pay, res.index[..., None], axis=-2
            )
        gidx = res.index + owner * m_local
        better = (res.dist_sq < best_d) | (
            (res.dist_sq == best_d) & (gidx < best_i)
        )
        return (
            jnp.where(better, res.dist_sq, best_d),
            jnp.where(better, gidx, best_i),
            jnp.where(better[..., None], matched, best_p),
        )

    def step(i, carry):
        if has_payload:
            best_d, best_i, best_p, db, dbm, pay = carry
        else:
            best_d, best_i, best_p, db, dbm = carry
            pay = None
        owner = (my - i) % n_dev
        best_d, best_i, best_p = fold(best_d, best_i, best_p, db, dbm,
                                      pay, owner)
        db = lax.ppermute(db, axis_name, perm)
        dbm = lax.ppermute(dbm, axis_name, perm)
        if has_payload:
            pay = lax.ppermute(pay, axis_name, perm)
            return (best_d, best_i, best_p, db, dbm, pay)
        return (best_d, best_i, best_p, db, dbm)

    init = (best_d, best_i, best_p, db_shard, db_shard_mask)
    if has_payload:
        init = init + (payload,)
    out = lax.fori_loop(0, n_dev - 1, step, init)
    if has_payload:
        best_d, best_i, best_p, db, dbm, pay = out
    else:
        best_d, best_i, best_p, db, dbm = out
        pay = None
    owner = (my - (n_dev - 1)) % n_dev
    best_d, best_i, best_p = fold(best_d, best_i, best_p, db, dbm, pay,
                                  owner)
    return NNResult(index=best_i, dist_sq=best_d), best_p
