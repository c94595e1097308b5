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


def test_db_pack_bit_identical_to_inline():
    """pack_db + db_pack= must reproduce the inline db prep bit-for-bit
    (warm seeded path and cold path), payload riding along."""
    from icp_rust_tpu.ops.nn_pallas import pack_db

    from icp_rust_tpu.ops.nn import nn_xla

    rng = np.random.default_rng(7)
    # m chosen so db_tile padding creates FULLY-EMPTY chunks (4096-3800
    # = 296 pad lanes > 2x128): the cold center bound must treat their
    # lo=+inf/hi=-inf boxes as +inf, not NaN (NaN poisoned the min and
    # emptied every survivor list on device).
    q, m, d = 512, 3800, 3
    query = jnp.asarray(rng.uniform(-3, 3, (q, d)), jnp.float32)
    db = jnp.asarray(rng.uniform(-3, 3, (m, d)), jnp.float32)
    mask = jnp.asarray(rng.random(m) > 0.05)
    pay = db[:, :2]
    kw = dict(q_tile=256, db_tile=1024, interpret=True, prune=True)

    truth = nn_xla(query, db, mask)
    pack = pack_db(db, mask, pay, db_tile=1024)
    for qb in (
        jnp.full((q,), jnp.inf, jnp.float32),  # cold branch
        truth.dist_sq * (1 + 32 * np.finfo(np.float32).eps),  # warm
    ):
        want, want_p = nn_pallas_matched(query, db, mask, payload=pay,
                                         q_bound=qb, **kw)
        got, got_p = nn_pallas_matched(query, db, mask, payload=pay,
                                       q_bound=qb, db_pack=pack, **kw)
        np.testing.assert_array_equal(np.asarray(want.index),
                                      np.asarray(truth.index))
        np.testing.assert_array_equal(np.asarray(got.index),
                                      np.asarray(want.index))
        np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                      np.asarray(want.dist_sq))
        np.testing.assert_array_equal(np.asarray(got_p),
                                      np.asarray(want_p))


def test_build_db_pack_gates():
    """build_db_pack returns a pack only when the seeded single-cloud
    Pallas path would serve the call (and the drivers stay correct when
    it returns None)."""
    from icp_rust_tpu.ops.nn import build_db_pack

    rng = np.random.default_rng(8)
    query = jnp.asarray(rng.uniform(-1, 1, (256, 3)), jnp.float32)
    db = jnp.asarray(rng.uniform(-1, 1, (4096, 3)), jnp.float32)
    # backend="pallas" forces use_pallas_nn True even on CPU
    pack = build_db_pack(query, db, backend="pallas", tile=1024)
    assert pack is not None
    assert pack.db_sl.shape == (4096 // 128 * 8, 128)
    assert pack.cbox.shape == (4096 // 128, 8)
    # too few tiles for pruning -> None
    assert build_db_pack(query, db, backend="pallas", tile=2048) is None
    # batched queries -> None
    qb = jnp.broadcast_to(query, (4, 256, 3))
    assert build_db_pack(qb, db, backend="pallas", tile=1024) is None
    # too many payload lanes -> None
    wide = jnp.zeros((4096, 6), jnp.float32)
    assert build_db_pack(query, db, payload=wide, backend="pallas",
                         tile=1024) is None
