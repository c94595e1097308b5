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
