"""Pair-block batched NN kernel (nn_pallas_matched_pairs) vs the XLA
sweep — interpret mode on CPU; the hardware tier re-asserts on Mosaic."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched_pairs


def _pairs(b=5, n=300, m=420, d=2, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.uniform(-3, 3, (b, n, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (b, m, d)), jnp.float32)
    dm = jnp.asarray(rng.random((b, m)) > 0.15)
    return q, db, dm


@pytest.mark.parametrize("d", [2, 3])
def test_pairs_kernel_matches_xla(d):
    q, db, dm = _pairs(d=d)
    res, matched = nn_pallas_matched_pairs(
        q, db, dm, pair_blk=4, q_sub=128, interpret=True
    )
    want = nn_xla(q, db, dm)
    np.testing.assert_array_equal(np.asarray(res.index),
                                  np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(res.dist_sq),
                               np.asarray(want.dist_sq), rtol=1e-6)
    # matched payload defaults to the db point itself
    gathered = jnp.take_along_axis(db, want.index[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(matched),
                                  np.asarray(gathered))


def test_pairs_kernel_tie_break_lowest_index():
    b, n = 3, 128
    q = jnp.zeros((b, n, 2), jnp.float32)
    db = jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (b, 384, 1))
    res, _ = nn_pallas_matched_pairs(q, db, pair_blk=2, q_sub=128,
                                     interpret=True)
    assert np.all(np.asarray(res.index) == 0)


def test_pairs_kernel_seeded_bound_bit_identical():
    """A valid per-query bound (prev dist + movement) prunes without
    changing ANY output bit — including across padded pairs/subtiles."""
    q, db, dm = _pairs(b=7, n=384, m=512, d=2, seed=3)
    base, _ = nn_pallas_matched_pairs(q, db, dm, pair_blk=4, q_sub=128,
                                      interpret=True)
    rng = np.random.default_rng(4)
    q2 = q + jnp.asarray(rng.normal(0, 0.05, q.shape), jnp.float32)
    move = jnp.linalg.norm(q2 - q, axis=-1)
    qb = (jnp.sqrt(base.dist_sq) + move) ** 2
    got, gp = nn_pallas_matched_pairs(q2, db, dm, q_bound=qb, pair_blk=4,
                                      q_sub=128, interpret=True)
    want, wp = nn_pallas_matched_pairs(q2, db, dm, pair_blk=4, q_sub=128,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(want.dist_sq))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))


def test_pairs_kernel_tight_bound_odd_chunks():
    """Survivor-list warm path with an eps-tight bound (== the true NN
    distance) and an ODD chunk count (m=384 -> 3 chunks): exercises the
    2-per-trip walk's padded tail (idempotent repeat of the first id)
    and the one-sided prune margin at its boundary."""
    q, db, dm = _pairs(b=4, n=256, m=384, d=2, seed=9)
    base, bp = nn_pallas_matched_pairs(q, db, dm, q_sub=128,
                                       interpret=True)
    got, gp = nn_pallas_matched_pairs(q, db, dm, q_bound=base.dist_sq,
                                      q_sub=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(base.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(base.dist_sq))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(bp))


def test_pairs_kernel_fully_masked_db_pair():
    q, db, dm = _pairs(b=3, n=256, m=256)
    dm = dm.at[1].set(False)  # pair 1 has no valid db points
    res, _ = nn_pallas_matched_pairs(q, db, dm, pair_blk=2, q_sub=128,
                                     interpret=True)
    assert np.all(np.isinf(np.asarray(res.dist_sq)[1]))
    assert np.all(np.isfinite(np.asarray(res.dist_sq)[0]))
