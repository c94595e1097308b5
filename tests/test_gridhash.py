"""Grid-hash 1-NN: exact-within-radius contract vs brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.ops.gridhash import build_grid, nn_gridhash
from icp_rust_tpu.ops.nn import nn_xla


def brute_within_radius(query, db, db_mask, r):
    d2 = ((query[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    d2[:, ~db_mask] = np.inf
    idx = d2.argmin(1)
    best = d2[np.arange(len(query)), idx]
    found = best <= r * r
    return idx, best, found


@pytest.mark.parametrize("d", [2, 3])
def test_gridhash_matches_brute_force(d):
    rng = np.random.default_rng(0)
    m, q, r = 800, 300, 0.25
    db = rng.uniform(-3, 3, (m, d)).astype(np.float32)
    db_mask = rng.random(m) > 0.1
    query = rng.uniform(-3, 3, (q, d)).astype(np.float32)

    grid = build_grid(jnp.asarray(db), jnp.asarray(db_mask), r,
                      table_size=1 << 12, bucket_cap=32)
    assert float(grid.overflow_frac) == 0.0
    res = nn_gridhash(jnp.asarray(query), grid, bucket_cap=32)

    idx_ref, best_ref, found_ref = brute_within_radius(query, db, db_mask, r)
    found = np.isfinite(np.asarray(res.dist_sq))
    np.testing.assert_array_equal(found, found_ref)
    # where found: identical neighbor (modulo exact-tie index ordering)
    np.testing.assert_allclose(
        np.asarray(res.dist_sq)[found], best_ref[found_ref], rtol=1e-6
    )
    agree = (np.asarray(res.index)[found] == idx_ref[found_ref]).mean()
    assert agree == 1.0


def test_gridhash_boundary_queries():
    """Query exactly on a cell boundary still sees neighbors either side."""
    db = jnp.asarray([[0.09, 0.0], [-0.09, 0.0]], jnp.float32)
    grid = build_grid(db, jnp.ones(2, bool), 0.1, table_size=256,
                      bucket_cap=4)
    res = nn_gridhash(jnp.asarray([[0.0, 0.0]], jnp.float32), grid,
                      bucket_cap=4)
    assert np.isfinite(float(res.dist_sq[0]))
    assert int(res.index[0]) in (0, 1)
    # tie-break: both at same distance -> lowest index
    assert int(res.index[0]) == 0


def test_gridhash_no_neighbor_in_radius():
    db = jnp.asarray([[10.0, 10.0]], jnp.float32)
    grid = build_grid(db, jnp.ones(1, bool), 0.5, table_size=256,
                      bucket_cap=4)
    res = nn_gridhash(jnp.zeros((1, 2), jnp.float32), grid, bucket_cap=4)
    assert not np.isfinite(float(res.dist_sq[0]))
    assert int(res.index[0]) == 0  # safe gather value


def test_gridhash_negative_coordinates():
    """floor() cell keying must be consistent for negative coords."""
    rng = np.random.default_rng(3)
    db = rng.uniform(-1.0, -0.2, (200, 3)).astype(np.float32)
    query = db + rng.normal(0, 0.01, db.shape).astype(np.float32)
    grid = build_grid(jnp.asarray(db), jnp.ones(200, bool), 0.1,
                      table_size=1 << 10, bucket_cap=32)
    res = nn_gridhash(jnp.asarray(query), grid, bucket_cap=32)
    ref = nn_xla(jnp.asarray(query), jnp.asarray(db))
    found = np.isfinite(np.asarray(res.dist_sq))
    assert found.all()
    np.testing.assert_allclose(
        np.asarray(res.dist_sq), np.asarray(ref.dist_sq), rtol=1e-5
    )


def test_gridhash_overflow_reported():
    """100 coincident points with bucket_cap=4 -> overflow reported."""
    db = jnp.zeros((100, 2), jnp.float32)
    grid = build_grid(db, jnp.ones(100, bool), 0.1, table_size=64,
                      bucket_cap=4)
    assert float(grid.overflow_frac) > 0.9


def test_gridhash_default_cap_through_jit():
    """The grid's own bucket_cap drives the query, incl. across jit."""
    import jax

    rng = np.random.default_rng(7)
    db = jnp.asarray(rng.uniform(-1, 1, (200, 2)), jnp.float32)
    query = db + 0.01

    @jax.jit
    def run(q, d):
        grid = build_grid(d, jnp.ones(200, bool), 0.2, table_size=1 << 10,
                          bucket_cap=32)
        return nn_gridhash(q, grid)  # default cap = grid's 32

    res = run(query, db)
    assert np.isfinite(np.asarray(res.dist_sq)).all()
