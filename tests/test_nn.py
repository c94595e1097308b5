"""Tests for the exact 1-NN correspondence search (KD-tree replacement)."""

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.ops.nn import nn_xla


def brute(query, db, db_mask=None):
    d = ((query[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    if db_mask is not None:
        d = np.where(db_mask[None, :], d, np.inf)
    return d.argmin(1), d.min(1)


def test_nn_exact_against_numpy():
    rng = np.random.default_rng(0)
    q = rng.uniform(-100, 100, (257, 2))
    db = rng.uniform(-100, 100, (511, 2))
    res = nn_xla(jnp.asarray(q), jnp.asarray(db), tile=128)
    idx, dist = brute(q, db)
    np.testing.assert_array_equal(np.asarray(res.index), idx)
    np.testing.assert_allclose(np.asarray(res.dist_sq), dist, rtol=1e-12)


def test_nn_3d_and_masking():
    rng = np.random.default_rng(1)
    q = rng.uniform(-1, 1, (100, 3))
    db = rng.uniform(-1, 1, (300, 3))
    mask = rng.uniform(size=300) > 0.5
    res = nn_xla(jnp.asarray(q), jnp.asarray(db), jnp.asarray(mask), tile=64)
    idx, dist = brute(q, db, mask)
    np.testing.assert_array_equal(np.asarray(res.index), idx)
    np.testing.assert_allclose(np.asarray(res.dist_sq), dist, rtol=1e-12)


def test_nn_tie_break_lowest_index():
    db = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])  # 0 and 2 tie
    q = jnp.asarray([[1.0, 0.0]])
    res = nn_xla(q, db, tile=1)  # force ties to straddle tiles
    assert int(res.index[0]) == 0
    res = nn_xla(q, db, tile=4)
    assert int(res.index[0]) == 0


def test_nn_batched():
    rng = np.random.default_rng(2)
    q = rng.uniform(-1, 1, (4, 50, 2))
    db = rng.uniform(-1, 1, (4, 70, 2))
    res = nn_xla(jnp.asarray(q), jnp.asarray(db), tile=32)
    assert res.index.shape == (4, 50)
    for b in range(4):
        idx, _ = brute(q[b], db[b])
        np.testing.assert_array_equal(np.asarray(res.index[b]), idx)


def test_nn_all_masked_db():
    q = jnp.asarray([[0.0, 0.0]])
    db = jnp.asarray([[1.0, 1.0], [2.0, 2.0]])
    res = nn_xla(q, db, jnp.zeros(2, bool))
    assert np.isinf(np.asarray(res.dist_sq)).all()
