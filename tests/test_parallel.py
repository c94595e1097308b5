"""Sharded-execution tests on a virtual 8-device CPU mesh.

Verifies that point-sharded alignment (psum GN reductions + ring-ppermute
NN) and pair-sharded batching reproduce the single-device results exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import icp2d
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.parallel import (
    make_mesh,
    ring_nearest_neighbor,
    sharded_estimate_transform,
    sharded_icp2d,
)
from icp_rust_tpu.parallel.sharded import batched_icp2d

F64 = jnp.float64
CFG = REFERENCE_CONFIG


def _pair(n=256, seed=0, noise=0.01):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-10, 10, (n, 2))
    t_true = RigidTransform2.from_twist(jnp.asarray([0.4, -0.3, 0.08], F64))
    dst = np.array(t_true.apply_points(jnp.asarray(src, F64)))
    dst += rng.normal(0, noise, dst.shape)
    return jnp.asarray(src, F64), jnp.asarray(dst, F64)


def test_ring_nn_matches_unsharded():
    mesh = make_mesh(("sp",), (8,))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.uniform(-5, 5, (64, 2)))
    db = jnp.asarray(rng.uniform(-5, 5, (128, 2)))
    dbm = jnp.asarray(rng.uniform(size=128) > 0.3)

    fn = jax.shard_map(
        lambda q_l, db_l, m_l: ring_nearest_neighbor(q_l, db_l, m_l, "sp"),
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp")),
        out_specs=P("sp"),
        check_vma=False,
    )
    res = fn(q, db, dbm)
    ref = nn_xla(q, db, dbm)
    np.testing.assert_array_equal(np.asarray(res.index), np.asarray(ref.index))
    np.testing.assert_allclose(
        np.asarray(res.dist_sq), np.asarray(ref.dist_sq), rtol=1e-12
    )


def test_sharded_estimate_transform_matches_single_device():
    src, dst = _pair(256)
    mask = jnp.ones(256, bool)
    mesh = make_mesh(("sp",), (8,))
    t_sh = sharded_estimate_transform(src, dst, mask, CFG, mesh)
    t_ref = align2d.estimate_transform(src, dst, mask, CFG)
    np.testing.assert_allclose(
        np.asarray(t_sh.rot), np.asarray(t_ref.rot), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(t_sh.t), np.asarray(t_ref.t), atol=1e-12
    )


def test_sharded_icp2d_matches_single_device():
    src, dst = _pair(256, seed=2)
    mask = jnp.ones(256, bool)
    mesh = make_mesh(("sp",), (8,))
    t0 = RigidTransform2.identity(dtype=F64)
    t_sh = sharded_icp2d(src, dst, mask, mask, t0, CFG, mesh)
    t_ref = icp2d(src, dst, mask, mask, t0, CFG)
    np.testing.assert_allclose(
        np.asarray(t_sh.rot), np.asarray(t_ref.rot), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(t_sh.t), np.asarray(t_ref.t), atol=1e-12
    )


def test_batched_icp2d_pair_sharded_matches_vmap():
    B, N = 8, 128
    rng = np.random.default_rng(3)
    src = np.zeros((B, N, 2))
    dst = np.zeros((B, N, 2))
    for b in range(B):
        s, d = _pair(N, seed=10 + b)
        src[b], dst[b] = np.asarray(s), np.asarray(d)
    mask = jnp.ones((B, N), bool)
    t0 = RigidTransform2.identity((B,), dtype=F64)
    mesh = make_mesh(("dp",), (8,))
    t_dp = batched_icp2d(
        jnp.asarray(src), jnp.asarray(dst), mask, mask, t0, CFG, mesh
    )
    t_ref = batched_icp2d(
        jnp.asarray(src), jnp.asarray(dst), mask, mask, t0, CFG, mesh=None
    )
    np.testing.assert_allclose(
        np.asarray(t_dp.t), np.asarray(t_ref.t), atol=1e-12
    )
    # And each lane matches the unbatched driver.
    for b in range(B):
        t_one = icp2d(
            jnp.asarray(src[b]), jnp.asarray(dst[b]),
            mask[b], mask[b], RigidTransform2.identity(dtype=F64), CFG,
        )
        np.testing.assert_allclose(
            np.asarray(t_dp.t[b]), np.asarray(t_one.t), atol=1e-12
        )


def test_ring_nn_matched_payload():
    """Matched-payload ring: winner's coordinates come through the carry
    identical to a global gather, with NO all_gather of the dst cloud."""
    from icp_rust_tpu.parallel.ring_nn import ring_nearest_neighbor_matched

    mesh = make_mesh(("sp",), (8,))
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.uniform(-5, 5, (64, 2)))
    db = jnp.asarray(rng.uniform(-5, 5, (128, 2)))
    dbm = jnp.asarray(rng.uniform(size=128) > 0.3)

    fn = jax.shard_map(
        lambda q_l, db_l, m_l: ring_nearest_neighbor_matched(
            q_l, db_l, m_l, "sp"),
        mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp")),
        out_specs=P("sp"),
        check_vma=False,
    )
    res, matched = fn(q, db, dbm)
    ref = nn_xla(q, db, dbm)
    np.testing.assert_array_equal(np.asarray(res.index),
                                  np.asarray(ref.index))
    np.testing.assert_array_equal(
        np.asarray(matched), np.asarray(db)[np.asarray(ref.index)]
    )
