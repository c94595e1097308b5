"""Matched-payload NN kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched


def test_matched_payload_default_coords():
    rng = np.random.default_rng(0)
    q, m, d = 256, 512, 3
    query = jnp.asarray(rng.uniform(-3, 3, (q, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (m, d)), jnp.float32)
    mask = jnp.asarray(rng.random(m) > 0.1)
    res, matched = nn_pallas_matched(query, db, mask, q_tile=128,
                                     db_tile=256, interpret=True)
    want = nn_xla(query, db, mask)
    np.testing.assert_array_equal(np.asarray(res.index),
                                  np.asarray(want.index))
    gathered = np.asarray(db)[np.asarray(want.index)]
    np.testing.assert_array_equal(np.asarray(matched), gathered)


def test_matched_payload_extra_features():
    """Payload with normals + validity rides along exactly."""
    rng = np.random.default_rng(1)
    q, m = 128, 384
    query = jnp.asarray(rng.uniform(-1, 1, (q, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-1, 1, (m, 3)), jnp.float32)
    normals = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    validity = jnp.asarray((rng.random(m) > 0.3).astype(np.float32))
    payload = jnp.concatenate([db, normals, validity[:, None]], axis=1)
    res, matched = nn_pallas_matched(query, db, payload=payload,
                                     q_tile=128, db_tile=128,
                                     interpret=True)
    idx = np.asarray(res.index)
    np.testing.assert_array_equal(np.asarray(matched[:, :3]),
                                  np.asarray(db)[idx])
    np.testing.assert_array_equal(np.asarray(matched[:, 3:6]),
                                  np.asarray(normals)[idx])
    np.testing.assert_array_equal(np.asarray(matched[:, 6]),
                                  np.asarray(validity)[idx])
