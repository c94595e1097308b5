"""Real-Mosaic kernel parity tests (TPU hardware tier).

Run with:  ICP_TPU_TESTS=1 python -m pytest tests -m tpu -q

Every Pallas kernel is asserted against the XLA path ON THE DEVICE —
interpret mode has already diverged from compiled Mosaic twice (sublane
alignment, argmin fusion), so this tier is the actual correctness gate for
the production f32 path (VERDICT r1 #3).  Everything is f32: TPU has no
native f64 and the CPU tier owns the f64 parity story.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.tpu

F32 = jnp.float32


def _require_tpu():
    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU backend available")


@pytest.fixture(scope="module", autouse=True)
def _tpu_only():
    _require_tpu()


# ---------------------------------------------------------------- NN kernel


def _clouds(q=300, m=1100, d=3, seed=0, masked=True):
    rng = np.random.default_rng(seed)
    query = jnp.asarray(rng.uniform(-3, 3, (q, d)), F32)
    db = jnp.asarray(rng.uniform(-3, 3, (m, d)), F32)
    db_mask = (
        jnp.asarray(rng.random(m) > 0.15) if masked else jnp.ones(m, bool)
    )
    return query, db, db_mask


@pytest.mark.parametrize("d", [2, 3])
@pytest.mark.parametrize("prune", [False, True])
def test_nn_kernel_matches_xla_odd_sizes(d, prune):
    """Odd (non-tile-multiple) sizes exercise the padding edges."""
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    query, db, db_mask = _clouds(q=300, m=1700, d=d, seed=d)
    got = nn_pallas(query, db, db_mask, q_tile=256, db_tile=512,
                    prune=prune)
    want = nn_xla(query, db, db_mask)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_allclose(np.asarray(got.dist_sq),
                               np.asarray(want.dist_sq), rtol=1e-6)


def test_nn_kernel_tie_break_lowest_index():
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    q = jnp.zeros((256, 2), F32)
    db = jnp.tile(jnp.asarray([[1.0, 0.0]], F32), (1536, 1))
    for prune in (False, True):
        got = nn_pallas(q, db, q_tile=256, db_tile=512, prune=prune)
        want = nn_xla(q, db)
        np.testing.assert_array_equal(np.asarray(got.index),
                                      np.asarray(want.index))
        assert int(got.index[0]) == 0


def test_nn_kernel_fully_masked_db():
    """All-masked db: dist +inf everywhere, indices still in-range."""
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    query, db, _ = _clouds(q=256, m=1536)
    got = nn_pallas(query, db, jnp.zeros(1536, bool), q_tile=256,
                    db_tile=512)
    assert np.all(np.isposinf(np.asarray(got.dist_sq)))
    idx = np.asarray(got.index)
    assert np.all((idx >= 0) & (idx < 1536))


def test_nn_matched_payload_parity():
    """Payload-carrying kernel (p2l shape: 7 features) vs gathers."""
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched

    query, db, db_mask = _clouds(q=300, m=1700, d=3, seed=7)
    payload = jnp.concatenate(
        [db, db * 2.0, db_mask.astype(F32)[..., None]], axis=-1
    )
    for prune in (False, True):
        res, pay = nn_pallas_matched(query, db, db_mask, payload=payload,
                                     q_tile=256, db_tile=512, prune=prune)
        want = nn_xla(query, db, db_mask)
        np.testing.assert_array_equal(np.asarray(res.index),
                                      np.asarray(want.index))
        gat = np.asarray(payload)[np.asarray(want.index)]
        np.testing.assert_array_equal(np.asarray(pay), gat)


def test_nn_pruned_sorted_layout_parity():
    """The production layout: azimuth-sorted clouds + pruned kernel."""
    from icp_rust_tpu.ops.nn import azimuth_order, nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    query, db, db_mask = _clouds(q=512, m=6144, d=3, seed=11)
    qo = azimuth_order(query)
    do = azimuth_order(db, db_mask)
    query = query[qo]
    db, db_mask = db[do], db_mask[do]
    got = nn_pallas(query, db, db_mask, q_tile=256, db_tile=512, prune=True)
    want = nn_xla(query, db, db_mask)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))


# ------------------------------------------------------------- GN kernels


def _gn_problem(seed=0, n=384, masked=True):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    c, s = np.cos(0.15), np.sin(0.15)
    dst = src @ np.array([[c, -s], [s, c]], np.float32).T + np.array(
        [0.3, -0.2], np.float32)
    dst += rng.normal(0, 0.05, dst.shape).astype(np.float32)
    dst[::17] += 3.0
    mask = (rng.random(n) > 0.2) if masked else np.ones(n, bool)
    return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask)


def test_gn_stats_kernel_matches_xla_on_device():
    from icp_rust_tpu.geometry.transform2d import RigidTransform2
    from icp_rust_tpu.ops import align2d, linalg
    from icp_rust_tpu.ops.align2d_pallas import assemble_update, gn_stats_pallas

    src, dst, mask = _gn_problem()
    t = RigidTransform2.identity(dtype=F32)
    ref = align2d.weighted_gauss_newton_update(t, src, dst, mask, 1.345)
    stats = gn_stats_pallas(src, dst, mask, t.rot, t.t, 1.345)
    jtj, jtr, err, nf, sig_x, sig_y = assemble_update(stats, t.rot)
    x, ok = linalg.solve3x3(jtj, jtr, 0.0)
    np.testing.assert_allclose(np.asarray(-x), np.asarray(ref.delta),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(err), float(ref.err), rtol=1e-4)
    assert int(nf) == int(mask.sum())


def test_gn_batched_kernel_matches_per_pair_on_device():
    from icp_rust_tpu.ops.align2d_pallas import (
        gn_stats_pallas,
        gn_stats_pallas_batched,
    )

    rng = np.random.default_rng(0)
    b, n = 4, 256
    src = jnp.asarray(rng.uniform(-2, 2, (b, n, 2)), F32)
    dst = src + jnp.asarray(rng.normal(0, 0.1, (b, n, 2)), F32)
    mask = jnp.asarray(rng.random((b, n)) > 0.2)
    mask = mask.at[3].set(False)  # fully-masked pair
    c, s = np.cos(0.2), np.sin(0.2)
    rot = jnp.broadcast_to(jnp.asarray([[c, -s], [s, c]], F32), (b, 2, 2))
    t = jnp.asarray(rng.normal(0, 0.1, (b, 2)), F32)
    got = gn_stats_pallas_batched(src, dst, mask, rot, t, 1.345)
    for i in range(b):
        want = gn_stats_pallas(src[i], dst[i], mask[i], rot[i], t[i], 1.345)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=2e-5, atol=1e-6)


def test_whole_loop_kernel_matches_xla_loop_on_device():
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops import align2d
    from icp_rust_tpu.ops.align2d_pallas import estimate_transform_pallas

    src, dst, mask = _gn_problem(seed=3, n=384)
    cfg = ICPConfig(compute_dtype=F32, det_rel_eps=1e-9,
                    align_backend="xla")
    t_ref = align2d.estimate_transform(src, dst, mask, cfg)
    rot, t = estimate_transform_pallas(
        src, dst, mask, cfg.huber_k, cfg.det_rel_eps,
        cfg.inner_delta_sq_tol, cfg.inner_max_iter, 1.0,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=5e-5)


def test_whole_loop_kernel_degenerate_on_device():
    """Perfect fit -> sigma 0 -> not ok -> identity (Option::None)."""
    from icp_rust_tpu.ops.align2d_pallas import estimate_transform_pallas

    src = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (128, 2)), F32)
    rot, t = estimate_transform_pallas(
        src, src, jnp.ones(128, bool), 1.345, 1e-9, 1e-6, 200, 1.0,
    )
    np.testing.assert_array_equal(np.asarray(rot), np.eye(2, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(t), np.zeros(2, np.float32))


def test_p2l_loop_kernel_matches_xla_on_device():
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops import align3d
    from icp_rust_tpu.ops.align3d_pallas import estimate_transform_p2l_pallas

    rng = np.random.default_rng(5)
    n = 1280
    src = jnp.asarray(rng.uniform(-2, 2, (n, 3)), F32)
    c, s = np.cos(0.05), np.sin(0.05)
    rot_gt = np.array(
        [[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    dst = src @ jnp.asarray(rot_gt.T) + jnp.asarray([0.1, -0.05, 0.02], F32)
    dst = dst + jnp.asarray(rng.normal(0, 0.01, (n, 3)), F32)
    normals = jnp.asarray(rng.normal(size=(n, 3)), F32)
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)
    mask = jnp.asarray(rng.random(n) > 0.1)

    cfg = ICPConfig(compute_dtype=F32, align_backend="xla")
    t_ref = align3d.estimate_transform_p2l(src, dst, normals, mask, cfg)
    rot, t = estimate_transform_p2l_pallas(
        src, dst, normals, mask, cfg.huber_k, cfg.inner_delta_sq_tol,
        cfg.inner_max_iter, 1.0,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=1e-4)


# -------------------------------------------------------- end-to-end smoke


def test_fused_odometry_smoke_on_device():
    """5-frame fused odometry, production (pallas) vs xla backends."""
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.models.odometry import run_odometry_fused

    rng = np.random.default_rng(0)
    f, n = 5, 1024
    base = rng.uniform(-5, 5, (n, 2)).astype(np.float32)
    frames = []
    for k in range(f):
        th = 0.02 * k
        c, s = np.cos(th), np.sin(th)
        rot = np.array([[c, -s], [s, c]], np.float32)
        frames.append(base @ rot.T + np.array([0.1 * k, 0.0], np.float32)
                      + rng.normal(0, 0.005, (n, 2)).astype(np.float32))
    frames = np.stack(frames)
    masks = np.ones((f, n), bool)

    cfg_p = ICPConfig(compute_dtype=F32, align_backend="pallas",
                      nn_backend="pallas")
    cfg_x = ICPConfig(compute_dtype=F32, align_backend="xla",
                      nn_backend="xla")
    _, path_p = run_odometry_fused(frames, masks, cfg_p)
    _, path_x = run_odometry_fused(frames, masks, cfg_x)
    assert np.all(np.isfinite(path_p))
    np.testing.assert_allclose(path_p, path_x, atol=2e-3)


def test_batched_whole_loop_kernel_on_device():
    """Block-desynchronized batched whole-loop kernel vs the XLA batched
    loop on real Mosaic (odd pair count spanning >1 block)."""
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops import align2d
    from icp_rust_tpu.ops.align2d_pallas import (
        estimate_transform_pallas_batched,
    )

    rng = np.random.default_rng(2)
    b, n = 70, 384  # 70 pairs -> 2 blocks of 64 with padding
    src = jnp.asarray(rng.uniform(-2, 2, (b, n, 2)), F32)
    c, s = np.cos(0.12), np.sin(0.12)
    dst = src @ jnp.asarray([[c, s], [-s, c]], F32) + jnp.asarray(
        [0.15, -0.1], F32)
    dst = dst + jnp.asarray(rng.normal(0, 0.02, (b, n, 2)), F32)
    mask = jnp.asarray(rng.random((b, n)) > 0.15)
    mask = mask.at[7].set(False)
    cfg = ICPConfig(compute_dtype=F32, det_rel_eps=1e-9,
                    align_backend="xla")
    t_ref = align2d.estimate_transform(src, dst, mask, cfg)
    rot, t = estimate_transform_pallas_batched(
        src, dst, mask, cfg.huber_k, cfg.det_rel_eps,
        cfg.inner_delta_sq_tol, cfg.inner_max_iter, 1.0,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=5e-5)
    np.testing.assert_array_equal(np.asarray(rot[7]),
                                  np.eye(2, dtype=np.float32))


def test_nn_prune_bound_bit_identical_on_device():
    """Seeded prune threshold: outputs bit-identical on real Mosaic."""
    from icp_rust_tpu.ops.nn import azimuth_order
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.uniform(-3, 3, (1024, 3)), F32)
    db = jnp.asarray(rng.uniform(-3, 3, (6144, 3)), F32)
    dm = jnp.asarray(rng.random(6144) > 0.1)
    q = q[azimuth_order(q)]
    do = azimuth_order(db, dm)
    db, dm = db[do], dm[do]
    base = nn_pallas(q, db, dm, q_tile=256, db_tile=512)
    q2 = q + jnp.asarray(rng.normal(0, 0.05, q.shape), F32)
    move = jnp.linalg.norm(q2 - q, axis=-1)
    qb = (jnp.sqrt(base.dist_sq) + move) ** 2
    got = nn_pallas(q2, db, dm, q_tile=256, db_tile=512, q_bound=qb)
    want = nn_pallas(q2, db, dm, q_tile=256, db_tile=512)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(want.dist_sq))


def test_p2l_driver_smoke_on_device():
    """3-frame SE(3) p2l odometry end-to-end on device (voxel normals,
    4-lane payload NN, whole-loop kernel, prune-bound seeding)."""
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp_p2l import icp_point_to_plane

    rng = np.random.default_rng(3)
    n = 4096
    base = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    base[:, 2] = 0.2 * base[:, 0] + 0.1 * base[:, 1]  # sloped plane
    base[n // 2:, 2] = 1.0  # plus a flat deck: full 6-DoF constraints? no
    # add two walls for translation observability
    base[: n // 4, 0] = -3.0
    base[n // 4: n // 2, 1] = 3.0
    cfg = ICPConfig(compute_dtype=F32, point_scale=1.0, det_rel_eps=1e-9)
    m = jnp.ones(n, bool)
    t_true = RigidTransform3.from_twist(
        jnp.asarray([0.04, -0.03, 0.02, 0.01, -0.01, 0.02], F32))
    src = jnp.asarray(base)
    dst = t_true.apply_points(src) + jnp.asarray(
        rng.normal(0, 2e-3, (n, 3)), F32)
    t, stats = icp_point_to_plane(
        src, dst, m, m, RigidTransform3.identity(dtype=F32), cfg,
        normals_voxel_size=0.5, return_stats=True,
    )
    pred = np.asarray(t.apply_points(src))
    want = np.asarray(t_true.apply_points(src))
    assert np.linalg.norm(pred - want, axis=1).max() < 2e-2
    assert int(stats.outer_iters) >= 1
    assert np.isfinite(float(stats.huber_error))


# ------------------------------------------- round-3 additions (VERDICT #7)


def test_gridhash_on_device():
    """Grid-hash NN (dynamic gathers, scatter build) on real Mosaic/XLA-TPU:
    exact-within-radius contract vs the dense sweep."""
    from icp_rust_tpu.ops.gridhash import build_grid, nn_gridhash
    from icp_rust_tpu.ops.nn import nn_xla

    rng = np.random.default_rng(21)
    m, q, r = 1024, 512, 0.3
    db = jnp.asarray(rng.uniform(-3, 3, (m, 3)), F32)
    dm = jnp.asarray(rng.random(m) > 0.1)
    query = jnp.asarray(rng.uniform(-3, 3, (q, 3)), F32)
    grid = build_grid(db, dm, r, table_size=1 << 12, bucket_cap=32)
    res = nn_gridhash(query, grid, bucket_cap=32)
    want = nn_xla(query, db, dm)
    found = np.isfinite(np.asarray(res.dist_sq))
    want_found = np.asarray(want.dist_sq) <= r * r
    np.testing.assert_array_equal(found, want_found)
    np.testing.assert_allclose(
        np.asarray(res.dist_sq)[found],
        np.asarray(want.dist_sq)[want_found], rtol=1e-6,
    )


def test_voxel_hash_scatter_on_device():
    """Voxel hash insert/centroids (the scatter accumulation path) on
    device vs a numpy replay: same occupied cells, same centroids."""
    from icp_rust_tpu.ops import voxel_hash as vh

    rng = np.random.default_rng(22)
    n, vs = 4096, 0.25
    pts_np = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    mask_np = rng.random(n) > 0.1
    pts, mask = jnp.asarray(pts_np), jnp.asarray(mask_np)
    m = vh.make_map(1 << 14, 3, vh.origin_for(pts, mask, vs))
    m, dropped = vh.insert(m, pts, mask, vs)
    assert int(dropped) == 0
    cent, occ = vh.centroids(m)
    cent = np.asarray(cent)[np.asarray(occ)]

    # numpy replay: group by integer cell id relative to the same origin
    origin = np.asarray(m.origin)
    cell = np.floor((pts_np[mask_np] - origin) / vs).astype(np.int64)
    key = (cell[:, 0] << 20) + (cell[:, 1] << 10) + cell[:, 2]
    want = {}
    for k, p in zip(key, pts_np[mask_np]):
        s, c = want.get(k, (np.zeros(3), 0))
        want[k] = (s + p, c + 1)
    want_cent = np.stack([s / c for s, c in want.values()])
    assert cent.shape[0] == len(want)
    # match by nearest (order differs): sort both by lexicographic coords
    def _sorted(a):
        return a[np.lexsort((a[:, 2], a[:, 1], a[:, 0]))]
    np.testing.assert_allclose(
        _sorted(cent), _sorted(want_cent.astype(np.float32)),
        rtol=0, atol=1e-5,
    )


def test_closed_form_eigensolver_on_device():
    """Closed-form symmetric 3x3 eigensolver vs jnp.linalg.eigh on device
    (f32): eigenvalues close, smallest-eigenvector parallel where the
    spectrum is well-separated."""
    from icp_rust_tpu.ops.linalg import sym3x3_eigh_smallest

    rng = np.random.default_rng(23)
    b = 4096
    a = rng.normal(0, 1, (b, 3, 3)).astype(np.float32)
    cov = a @ np.swapaxes(a, 1, 2)  # PSD symmetric
    covj = jnp.asarray(cov, F32)
    evals, v0 = jax.jit(sym3x3_eigh_smallest)(covj)
    evals = np.asarray(evals)
    v0 = np.asarray(v0)
    w_ref, v_ref = np.linalg.eigh(cov.astype(np.float64))
    scale = np.abs(w_ref[:, 2]) + 1.0
    np.testing.assert_allclose(
        evals, w_ref.astype(np.float32), atol=1e-3 * scale[:, None].max(),
        rtol=1e-3,
    )
    # eigenvector check where lam0 is well-separated from lam1
    sep = (w_ref[:, 1] - w_ref[:, 0]) / scale > 1e-2
    cosang = np.abs(np.sum(v0[sep] * v_ref[sep, :, 0], axis=-1))
    nrm = np.linalg.norm(v0[sep], axis=-1)
    assert np.all(cosang / np.maximum(nrm, 1e-30) > 0.999)


def test_pairs_kernel_on_device():
    """Pair-block batched NN (one pallas_call for many small pairs) on
    real Mosaic: XLA-sweep parity incl. ties, plus seeded-bound
    bit-identity and whole-batched-ICP agreement."""
    import dataclasses

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.geometry.transform2d import RigidTransform2
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched_pairs
    from icp_rust_tpu.parallel.sharded import batched_icp2d

    rng = np.random.default_rng(31)
    b, n, m = 11, 640, 768
    q = jnp.asarray(rng.uniform(-3, 3, (b, n, 2)), F32)
    db = jnp.asarray(rng.uniform(-3, 3, (b, m, 2)), F32)
    dm = jnp.asarray(rng.random((b, m)) > 0.1)
    res, matched = nn_pallas_matched_pairs(q, db, dm, pair_blk=4)
    want = nn_xla(q, db, dm)
    np.testing.assert_array_equal(np.asarray(res.index),
                                  np.asarray(want.index))
    gathered = jnp.take_along_axis(db, want.index[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(matched),
                                  np.asarray(gathered))

    # Seeded bound: bit-identical outputs.
    q2 = q + jnp.asarray(rng.normal(0, 0.05, q.shape), F32)
    move = jnp.linalg.norm(q2 - q, axis=-1)
    qb = (jnp.sqrt(res.dist_sq) + move) ** 2
    got, gp = nn_pallas_matched_pairs(q2, db, dm, q_bound=qb, pair_blk=4)
    ref, rp = nn_pallas_matched_pairs(q2, db, dm, pair_blk=4)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(ref.index))
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(rp))

    # End-to-end batched ICP: pairs backend == XLA backend bit-for-bit
    # under the same (sorted) layout.
    base = rng.uniform(-2, 2, (b, 512, 2)).astype(np.float32)
    ths = rng.uniform(-0.05, 0.05, b)
    shift = rng.uniform(-0.05, 0.05, (b, 1, 2)).astype(np.float32)
    rot = np.stack([np.array([[np.cos(t), -np.sin(t)],
                              [np.sin(t), np.cos(t)]]) for t in ths])
    dst2 = np.einsum("bij,bnj->bni", rot, base) + shift
    srcj = jnp.asarray(base)
    dstj = jnp.asarray(dst2.astype(np.float32))
    mask = jnp.ones((b, 512), bool)
    cfg = ICPConfig(compute_dtype=F32, point_scale=1.0, det_rel_eps=1e-9,
                    nn_sort="azimuth", nn_backend="xla")
    t0 = RigidTransform2.identity((b,), F32)
    out_x = batched_icp2d(srcj, dstj, mask, mask, t0, config=cfg)
    cfg_p = dataclasses.replace(cfg, nn_backend="pairs")
    out_p = batched_icp2d(srcj, dstj, mask, mask, t0, config=cfg_p)
    np.testing.assert_array_equal(np.asarray(out_x.t),
                                  np.asarray(out_p.t))
    np.testing.assert_array_equal(np.asarray(out_x.rot),
                                  np.asarray(out_p.rot))


def test_list_kernel_on_device():
    """Survivor-list NN kernel (round-3 warm path): compiled-Mosaic
    bit-exactness vs the unpruned sweep, Morton-sorted 28800-pt clouds,
    zero-slack seeds, payload riding along; plus cold/warm dispatch."""
    from icp_rust_tpu.ops.nn import morton_order, nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched

    rng = np.random.default_rng(42)
    n = 28800
    ang = rng.uniform(-np.pi, np.pi, n)
    rad = rng.uniform(0.3, 20.0, n)
    db_np = np.stack([
        rad * np.cos(ang), rad * np.sin(ang),
        rng.uniform(-0.5, 2.0, n),
    ], axis=1).astype(np.float32)
    q_np = (db_np + rng.normal(0, 0.02, db_np.shape)).astype(np.float32)
    dm_np = rng.random(n) > 0.02
    do = np.asarray(morton_order(jnp.asarray(db_np), jnp.asarray(dm_np)))
    qo = np.asarray(morton_order(jnp.asarray(q_np), None))
    db = jnp.asarray(db_np[do]); dm = jnp.asarray(dm_np[do])
    q = jnp.asarray(q_np[qo])
    pay = db[:, :2]

    want, want_p = nn_pallas_matched(q, db, dm, payload=pay, q_tile=256,
                                     db_tile=2048, prune=False)
    # warm: exact-distance seeds (tightest valid bound)
    qb = want.dist_sq * (1 + 32 * np.finfo(np.float32).eps)
    got, got_p = nn_pallas_matched(q, db, dm, payload=pay, q_tile=256,
                                   db_tile=2048, prune=True, q_bound=qb)
    np.testing.assert_array_equal(np.asarray(got.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(got.dist_sq),
                                  np.asarray(want.dist_sq))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    # cold: +inf seeds dispatch to the cold branch (the decimated-seed
    # pre-pass by default; ICP_NN_COLD_SEED=0 would route to zig-zag)
    qb_inf = jnp.full((n,), jnp.inf, F32)
    cold, cold_p = nn_pallas_matched(q, db, dm, payload=pay, q_tile=256,
                                     db_tile=2048, prune=True,
                                     q_bound=qb_inf)
    np.testing.assert_array_equal(np.asarray(cold.index),
                                  np.asarray(want.index))
    np.testing.assert_array_equal(np.asarray(cold_p), np.asarray(want_p))


def test_db_pack_bit_identical_on_device():
    """pack_db (the per-frame KdTree-build analogue) vs the inline db
    prep: compiled-Mosaic bit-exactness through the warm survivor-list
    path, the cold decimated-seed path, and the driver entry."""
    from icp_rust_tpu.ops.nn import build_db_pack, nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched, pack_db

    rng = np.random.default_rng(11)
    q, m = 2048, 8192
    query = jnp.asarray(rng.uniform(-3, 3, (q, 3)), F32)
    db = jnp.asarray(rng.uniform(-3, 3, (m, 3)), F32)
    mask = jnp.asarray(rng.random(m) > 0.05)
    pay = db[:, :2]
    pack = pack_db(db, mask, pay, db_tile=2048)
    want = nn_xla(query, db, mask)
    # exact-distance seeds = tightest VALID bound (warm path)
    qb = want.dist_sq * (1 + 32 * np.finfo(np.float32).eps)
    for bound in (qb, jnp.full((q,), jnp.inf, F32)):
        ref, ref_p = nn_pallas_matched(query, db, mask, payload=pay,
                                       q_tile=256, db_tile=2048,
                                       q_bound=bound)
        got, got_p = nn_pallas_matched(query, db, mask, payload=pay,
                                       q_tile=256, db_tile=2048,
                                       q_bound=bound, db_pack=pack)
        np.testing.assert_array_equal(np.asarray(got.index),
                                      np.asarray(ref.index))
        np.testing.assert_array_equal(np.asarray(got.index),
                                      np.asarray(want.index))
        np.testing.assert_array_equal(np.asarray(got_p),
                                      np.asarray(ref_p))
    # the dispatch-level builder gates + threads through identically
    assert build_db_pack(query, db, mask, payload=pay, backend="pallas",
                         tile=2048) is not None


def test_frame_kernel_on_device():
    """Whole-frame fused 2D ICP kernel (one launch per Icp2d::estimate
    call) vs the unfused pallas driver, compiled Mosaic, warm-started."""
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.geometry.transform2d import RigidTransform2
    from icp_rust_tpu.models.icp2d import icp2d

    rng = np.random.default_rng(21)
    # m < n: unequal valid counts must actually reach the kernel (the
    # old m=640 sliced a 600-row array back to 600 — advisor r4).
    n, m, pad = 600, 560, 768
    src = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    th = 0.3
    rot = np.array([[np.cos(th), -np.sin(th)],
                    [np.sin(th), np.cos(th)]], np.float32)
    dst = (src @ rot.T + np.array([0.4, 0.2], np.float32))
    dst = dst[rng.permutation(n)][:m]
    assert len(dst) == m

    def pad2(a):
        out = np.zeros((pad, 2), np.float32)
        out[: len(a)] = a
        msk = np.zeros(pad, bool)
        msk[: len(a)] = True
        return jnp.asarray(out), jnp.asarray(msk)

    sp, sm = pad2(src)
    dp, dm = pad2(dst)
    wth = 0.25
    warm = RigidTransform2(
        rot=jnp.asarray([[np.cos(wth), -np.sin(wth)],
                         [np.sin(wth), np.cos(wth)]], F32),
        t=jnp.asarray([0.35, 0.15], F32),
    )
    cfg_frame = ICPConfig(compute_dtype=F32, det_rel_eps=1e-9,
                          frame_backend="auto")
    cfg_off = cfg_frame.with_(frame_backend="off")
    tf = icp2d(sp, dp, sm, dm, warm, cfg_frame)
    tu = icp2d(sp, dp, sm, dm, warm, cfg_off)
    np.testing.assert_allclose(np.asarray(tf.rot), np.asarray(tu.rot),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(tf.t), np.asarray(tu.t),
                               atol=5e-5)
    # recovers the synthetic motion
    np.testing.assert_allclose(np.asarray(tf.rot), rot, atol=5e-3)
    # perfect fit: warm identity start returns exactly identity
    ti = icp2d(sp, sp, sm, sm,
               RigidTransform2.identity(dtype=F32), cfg_frame)
    np.testing.assert_array_equal(np.asarray(ti.rot),
                                  np.eye(2, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(ti.t), np.zeros(2, np.float32))


def test_batched_matched_nn_on_device_vmapped_fallback():
    """Batched (vmapped) matched NN on compiled Mosaic: the pruned
    kernels cannot lower under vmap (their per-tile SMEM row windows
    become (Squeezed, k) block shapes Mosaic rejects), so the dispatch
    must fall back to the plain vmapped sweep and stay exact — the
    sharded dp/dp_sp paths hit exactly this on real hardware (round-5
    gate; before it, bench_scaling crashed at mesh dp=1,sp=1)."""
    from icp_rust_tpu.ops import nn_pallas as m

    rng = np.random.default_rng(7)
    B, N, M = 3, 512, 2048
    q = jnp.asarray(rng.uniform(-3, 3, (B, N, 2)), F32)
    db_np = rng.uniform(-3, 3, (B, M, 2)).astype(np.float32)
    dm_np = np.ones((B, M), bool)
    dm_np[:, M - 70:] = False  # masked db tail must be invisible
    db = jnp.asarray(db_np)
    dm = jnp.asarray(dm_np)
    qb = jnp.full((B, N), jnp.inf, F32)  # seeded path, batched -> gate
    res, pay = m.nn_pallas_matched(q, db, dm, q_tile=256, db_tile=512,
                                   q_bound=qb)
    d2 = ((np.asarray(q)[:, :, None, :] - db_np[:, None, :, :]) ** 2
          ).sum(-1)
    d2 = np.where(dm_np[:, None, :], d2, np.inf)
    want_idx = d2.argmin(-1)
    np.testing.assert_array_equal(np.asarray(res.index), want_idx)
    np.testing.assert_allclose(np.asarray(res.dist_sq), d2.min(-1),
                               rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(pay),
        np.take_along_axis(db_np, want_idx[..., None], axis=1),
    )


def test_frame_kernel_at_max_size_on_device():
    """Compile + validate BOTH whole-frame kernels at pad ==
    frame_kernel_max on compiled Mosaic: the auto gate admits scans up
    to this size, so the cap must be a size Mosaic actually compiles
    (advisor r4: the old 2048 default exceeded the 16 MB VMEM budget —
    measured: 1536 compiles, 2048 does not)."""
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.geometry.transform2d import RigidTransform2
    from icp_rust_tpu.models.icp2d import icp2d

    cfg = ICPConfig(compute_dtype=F32, det_rel_eps=1e-9,
                    frame_backend="auto")
    pad = cfg.frame_kernel_max
    rng = np.random.default_rng(33)
    n, m = pad - 66, pad - 130
    src = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    th = 0.1
    rot = np.array([[np.cos(th), -np.sin(th)],
                    [np.sin(th), np.cos(th)]], np.float32)
    dst = (src @ rot.T + np.array([0.1, -0.05], np.float32))
    dst = dst[rng.permutation(n)][:m]

    def pad2(a):
        out = np.zeros((pad, 2), np.float32)
        out[: len(a)] = a
        msk = np.zeros(pad, bool)
        msk[: len(a)] = True
        return jnp.asarray(out), jnp.asarray(msk)

    sp, sm = pad2(src)
    dp, dm = pad2(dst)
    t0 = RigidTransform2.identity(dtype=F32)
    tf = icp2d(sp, dp, sm, dm, t0, cfg)
    np.testing.assert_allclose(np.asarray(tf.rot), rot, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tf.t), [0.1, -0.05], atol=5e-3)
    # pair-grid variant at the same cap (one pair per grid step)
    tb = icp2d(sp[None], dp[None], sm[None], dm[None],
               RigidTransform2.identity((1,), F32),
               cfg.with_(frame_backend="pairs"))
    np.testing.assert_allclose(np.asarray(tb.rot[0]), rot, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tb.t[0]), [0.1, -0.05], atol=5e-3)
