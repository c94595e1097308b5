"""Pallas NN kernel vs the XLA sweep (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas


@pytest.mark.parametrize("d", [2, 3])
@pytest.mark.parametrize("q,m", [(256, 512), (300, 700)])
def test_pallas_matches_xla(d, q, m):
    rng = np.random.default_rng(q + m + d)
    query = jnp.asarray(rng.uniform(-3, 3, (q, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (m, d)), jnp.float32)
    db_mask = jnp.asarray(rng.random(m) > 0.15)
    got = nn_pallas(query, db, db_mask, q_tile=128, db_tile=256,
                    interpret=True)
    want = nn_xla(query, db, db_mask)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(got.dist_sq),
                               np.asarray(want.dist_sq), rtol=1e-6)


def test_pallas_tie_break_lowest_index():
    """Duplicate db points across tiles/lanes -> lowest index wins."""
    q = jnp.zeros((128, 2), jnp.float32)
    db = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (512, 1))
    got = nn_pallas(q, db, q_tile=128, db_tile=256, interpret=True)
    want = nn_xla(q, db)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    assert int(got.index[0]) == 0


def test_pallas_batched():
    rng = np.random.default_rng(0)
    query = jnp.asarray(rng.uniform(-1, 1, (2, 128, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-1, 1, (2, 256, 3)), jnp.float32)
    got = nn_pallas(query, db, q_tile=128, db_tile=128, interpret=True)
    want = nn_xla(query, db)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))


def test_pallas_prune_boundary_stress():
    """Adversarial prune-margin stress (ADVICE r2 #1): queries sitting
    EXACTLY on db points and on tile-bbox corners, with a ZERO-slack
    q_bound (the exact NN distance²).  The kernel's bbox lower bound is
    rounded f32 and could exceed the true bound by a few ulp; the
    one-sided lb deflation must keep the pruned output bit-identical to
    the unpruned sweep even in this tightest case."""
    rng = np.random.default_rng(1234)
    for trial in range(4):
        m = 2048
        xs = np.sort(rng.uniform(-100, 100, m)).astype(np.float32)
        db = np.stack(
            [xs, rng.uniform(-1, 1, m).astype(np.float32)], axis=1
        )
        # Tile-bbox corners for db_tile=256 (lo and hi per tile).
        t = db.reshape(-1, 256, 2)
        corners = np.concatenate([t.min(1), t.max(1)], axis=0)
        q_np = np.concatenate([
            rng.uniform(-100, 100, (120, 2)).astype(np.float32),
            db[rng.integers(0, m, 120)],          # exact db copies
            corners.astype(np.float32),           # exact bbox corners
        ])
        q = jnp.asarray(q_np)
        dbj = jnp.asarray(db)
        want = nn_pallas(q, dbj, q_tile=128, db_tile=256,
                         interpret=True, prune=False)
        got = nn_pallas(q, dbj, q_tile=128, db_tile=256, interpret=True,
                        prune=True, q_bound=want.dist_sq)
        np.testing.assert_array_equal(np.asarray(got.index),
                                      np.asarray(want.index))
        np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                      np.asarray(want.dist_sq))


def test_pallas_prune_bound_bit_identical():
    """A valid q_bound (prev dist + movement) seeds the prune threshold
    without changing ANY output bit (incl. tie-breaks)."""
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.uniform(-3, 3, (512, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (2048, 3)), jnp.float32)
    dm = jnp.asarray(rng.random(2048) > 0.1)
    base = nn_pallas(q, db, dm, q_tile=128, db_tile=256, interpret=True)
    # Simulate an ICP iteration: perturb queries, bound = old dist + move.
    q2 = q + jnp.asarray(rng.normal(0, 0.05, q.shape), jnp.float32)
    move = jnp.linalg.norm(q2 - q, axis=-1)
    qb = (jnp.sqrt(base.dist_sq) + move) ** 2
    got = nn_pallas(q2, db, dm, q_tile=128, db_tile=256, interpret=True,
                    q_bound=qb)
    want = nn_pallas(q2, db, dm, q_tile=128, db_tile=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(want.dist_sq))


def test_list_kernel_matched_warm_bit_identical():
    """Finite seeds route to the survivor-list kernel (_nn_seeded_2d);
    outputs incl. payload must be bit-identical to the unpruned sweep."""
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched
    from icp_rust_tpu.ops.nn import morton_order

    rng = np.random.default_rng(77)
    q_np = rng.uniform(-3, 3, (700, 3)).astype(np.float32)
    db_np = rng.uniform(-3, 3, (2048, 3)).astype(np.float32)
    dm_np = rng.random(2048) > 0.1
    order = np.asarray(morton_order(jnp.asarray(db_np),
                                    jnp.asarray(dm_np)))
    db = jnp.asarray(db_np[order])
    dm = jnp.asarray(dm_np[order])
    q = jnp.asarray(q_np)
    pay = db[:, :2]
    want, want_p = nn_pallas_matched(q, db, dm, payload=pay, q_tile=128,
                                     db_tile=256, interpret=True,
                                     prune=False)
    qb = want.dist_sq * (1 + 32 * np.finfo(np.float32).eps)
    got, got_p = nn_pallas_matched(q, db, dm, payload=pay, q_tile=128,
                                   db_tile=256, interpret=True,
                                   prune=True, q_bound=qb)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(want.dist_sq))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_list_kernel_overflow_falls_back_to_full_sweep():
    """A finite but huge bound makes every chunk survive (> cap) -> the
    kernel's full-sweep fallback; still bit-identical."""
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched

    rng = np.random.default_rng(78)
    q = jnp.asarray(rng.uniform(-3, 3, (256, 2)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (1536, 2)), jnp.float32)
    want, want_p = nn_pallas_matched(q, db, q_tile=128, db_tile=256,
                                     interpret=True, prune=False)
    qb = jnp.full((256,), 1e30, jnp.float32)  # finite => warm dispatch
    got, got_p = nn_pallas_matched(q, db, q_tile=128, db_tile=256,
                                   interpret=True, prune=True,
                                   q_bound=qb)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def _cold_dispatch_case(cold_seed, db_mask=None, seed: int = 79):
    """All-inf bounds (ICP iteration 1) -> the cold branch; output must be
    bit-identical to the unpruned sweep under EITHER cold strategy (the
    decimated-seed pre-pass or the zig-zag kernel)."""
    from icp_rust_tpu.ops import nn_pallas as m

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-3, 3, (256, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (1536, 3)), jnp.float32)
    want, want_p = m.nn_pallas_matched(q, db, db_mask, q_tile=128,
                                       db_tile=256, interpret=True,
                                       prune=False)
    qb = jnp.full((256,), jnp.inf, jnp.float32)
    old = m._COLD_SEED
    m._COLD_SEED = str(cold_seed)
    m._nn_seeded_2d.clear_cache()  # the flag is read at trace time
    try:
        got, got_p = m.nn_pallas_matched(q, db, db_mask, q_tile=128,
                                         db_tile=256, interpret=True,
                                         prune=True, q_bound=qb)
    finally:
        m._COLD_SEED = old
        m._nn_seeded_2d.clear_cache()
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))


def test_seeded_dispatch_cold_decimated_seed():
    _cold_dispatch_case(cold_seed=1)


def test_seeded_dispatch_no_cond_min_bound():
    """Mode 3 (no warmth cond: decimated bound min'd with the seed)."""
    _cold_dispatch_case(cold_seed=3)


def test_seeded_dispatch_cold_zigzag():
    _cold_dispatch_case(cold_seed=0)


def test_seeded_dispatch_cold_decimated_masked_db():
    """Heavy masking: the decimated subset is mostly sentinel; the bound
    degrades toward the full-sweep fallback but stays exact."""
    rng = np.random.default_rng(80)
    dm = jnp.asarray(rng.random(1536) > 0.95)
    _cold_dispatch_case(cold_seed=1, db_mask=dm, seed=80)


def test_morton_order_properties():
    """Morton order is a valid permutation, masked points land last, and
    nearby points cluster (locality sanity)."""
    from icp_rust_tpu.ops.nn import morton_order

    rng = np.random.default_rng(80)
    pts = jnp.asarray(rng.uniform(-5, 5, (1000, 2)), jnp.float32)
    mask = jnp.asarray(rng.random(1000) > 0.2)
    order = np.asarray(morton_order(pts, mask))
    assert sorted(order.tolist()) == list(range(1000))
    m_np = np.asarray(mask)
    n_valid = int(m_np.sum())
    assert not m_np[order][n_valid:].any()
    # locality: mean distance between order-adjacent VALID points is far
    # below the mean distance of random pairs
    p = np.asarray(pts)[order][:n_valid]
    adj = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
    rand = np.linalg.norm(
        p[rng.integers(0, n_valid, 500)] - p[rng.integers(0, n_valid, 500)],
        axis=1).mean()
    assert adj < rand / 3


def test_center_bound_is_valid_upper_bound():
    """The cold-iteration chunk-center bound must upper-bound the true
    NN distance^2 for EVERY query (an invalid bound silently breaks
    pruning exactness), across random clouds, masks, and padding-induced
    empty chunks."""
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import (
        _center_bound, _dbf_cm_matched, _round_up, _tile_boxes,
    )

    rng = np.random.default_rng(123)
    for m, db_tile, mask_p in ((3800, 1024, 0.1), (4096, 1024, 0.0),
                               (2900, 512, 0.5)):
        q = 512
        query = jnp.asarray(rng.uniform(-5, 5, (q, 3)), jnp.float32)
        db = jnp.asarray(rng.uniform(-5, 5, (m, 3)), jnp.float32)
        mask = jnp.asarray(rng.random(m) >= mask_p)
        m_pad = _round_up(m, db_tile)
        dbf = _dbf_cm_matched(db, mask, db, m_pad)
        cbox = _tile_boxes(dbf[:3], 128)
        qb = np.asarray(_center_bound(query, cbox, 3))
        true_d = np.asarray(nn_xla(query, db, mask).dist_sq)
        assert not np.isnan(qb).any()
        assert (qb >= true_d).all(), (
            f"violations at m={m}: {(qb < true_d).sum()}"
        )
