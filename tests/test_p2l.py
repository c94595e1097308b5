"""Point-to-plane SE(3) ICP tests: normals, 6-DOF GN, full driver."""

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models.icp_p2l import icp_point_to_plane
from icp_rust_tpu.ops import align3d
from icp_rust_tpu.ops.normals import estimate_normals, knn_xla

F64 = jnp.float64
CFG = REFERENCE_CONFIG


def _box_cloud(n_per_face=200, seed=0):
    """Points on three orthogonal faces of a box (well-constrained for
    point-to-plane in all 6 DOF)."""
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 2, (n_per_face, 2))
    fx = np.column_stack([np.zeros(n_per_face), u])          # x=0 plane
    fy = np.column_stack([u[:, :1], np.zeros(n_per_face), u[:, 1:]])
    fz = np.column_stack([u, np.zeros(n_per_face)])          # z=0 plane
    return np.concatenate([fx, fy, fz], axis=0)


def test_knn_matches_numpy():
    rng = np.random.default_rng(1)
    q = rng.uniform(-1, 1, (50, 3))
    db = rng.uniform(-1, 1, (200, 3))
    d, i = knn_xla(jnp.asarray(q, F64), jnp.asarray(db, F64), k=5, tile=64)
    full = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    ref_i = np.argsort(full, axis=1)[:, :5]
    ref_d = np.take_along_axis(full, ref_i, axis=1)
    np.testing.assert_allclose(np.asarray(d), ref_d, atol=1e-12)
    np.testing.assert_array_equal(np.sort(np.asarray(i), 1), np.sort(ref_i, 1))


def test_normals_on_plane():
    rng = np.random.default_rng(2)
    u = rng.uniform(-1, 1, (300, 2))
    pts = np.column_stack([u[:, 0], u[:, 1], np.full(300, 2.0)])  # z=2 plane
    n, valid = estimate_normals(
        jnp.asarray(pts, F64), jnp.ones(300, bool), k=8
    )
    assert bool(valid.all())
    nz = np.abs(np.asarray(n)[:, 2])
    np.testing.assert_allclose(nz, 1.0, atol=1e-6)
    # Oriented toward the origin (z=0 side -> n_z < 0).
    assert (np.asarray(n)[:, 2] < 0).all()


def test_p2l_gn_update_reduces_error():
    pts = _box_cloud()
    t_true = RigidTransform3.from_twist(
        jnp.asarray([0.02, -0.01, 0.015, 0.01, -0.02, 0.008], F64)
    )
    src = jnp.asarray(pts, F64)
    dst = t_true.apply_points(src)
    normals, nv = estimate_normals(dst, jnp.ones(len(pts), bool), k=8)
    mask = jnp.ones(len(pts), bool) & nv
    t0 = RigidTransform3.identity(dtype=F64)
    upd = align3d.weighted_gn_update_p2l(
        t0, src, dst, normals, mask, CFG.huber_k
    )
    assert bool(upd.ok)
    t1 = RigidTransform3.from_twist(upd.delta).compose(t0)
    e0 = float(align3d.huber_error_p2l(t0, src, dst, normals, mask, CFG.huber_k))
    e1 = float(align3d.huber_error_p2l(t1, src, dst, normals, mask, CFG.huber_k))
    assert e1 < e0 * 0.05


def test_p2l_degenerate_single_plane_not_ok():
    # One plane constrains only 3 DOF -> J^T J singular -> not ok.
    rng = np.random.default_rng(3)
    u = rng.uniform(-1, 1, (100, 2))
    pts = np.column_stack([u, np.zeros(100)])
    src = jnp.asarray(pts, F64)
    dst = src + jnp.asarray([0.0, 0.0, 0.01], F64)
    normals = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], F64), (100, 3))
    upd = align3d.weighted_gn_update_p2l(
        RigidTransform3.identity(dtype=F64), src, dst, normals,
        jnp.ones(100, bool), CFG.huber_k,
    )
    assert not bool(upd.ok)


def test_icp_p2l_recovers_transform():
    pts = _box_cloud()
    rng = np.random.default_rng(4)
    t_true = RigidTransform3.from_twist(
        jnp.asarray([0.03, -0.02, 0.025, 0.015, -0.01, 0.02], F64)
    )
    src = jnp.asarray(pts, F64)
    dst = t_true.apply_points(src) + jnp.asarray(
        rng.normal(0, 5e-4, pts.shape), F64
    )
    n = len(pts)
    t_pred = icp_point_to_plane(
        src, dst, jnp.ones(n, bool), jnp.ones(n, bool),
        RigidTransform3.identity(dtype=F64), CFG,
    )
    pred = np.asarray(t_pred.apply_points(src))
    err = np.linalg.norm(pred - np.asarray(t_true.apply_points(src)), axis=1)
    assert err.max() < 5e-3, err.max()


def test_icp_p2l_outlier_robustness():
    pts = _box_cloud()
    rng = np.random.default_rng(5)
    t_true = RigidTransform3.from_twist(
        jnp.asarray([0.02, 0.01, -0.015, 0.01, 0.005, -0.01], F64)
    )
    src_np = pts.copy()
    dst = np.array(
        RigidTransform3.from_twist(
            jnp.asarray([0.02, 0.01, -0.015, 0.01, 0.005, -0.01], F64)
        ).apply_points(jnp.asarray(pts, F64))
    )
    # Corrupt 5% of the destination points grossly.
    bad = rng.choice(len(pts), len(pts) // 20, replace=False)
    dst[bad] += rng.normal(0, 1.0, (len(bad), 3))
    n = len(pts)
    t_pred = icp_point_to_plane(
        jnp.asarray(src_np, F64), jnp.asarray(dst, F64),
        jnp.ones(n, bool), jnp.ones(n, bool),
        RigidTransform3.identity(dtype=F64), CFG,
    )
    good = np.setdiff1d(np.arange(n), bad)
    pred = np.asarray(t_pred.apply_points(jnp.asarray(src_np, F64)))[good]
    want = np.asarray(t_true.apply_points(jnp.asarray(src_np, F64)))[good]
    err = np.linalg.norm(pred - want, axis=1)
    assert np.median(err) < 5e-3, np.median(err)


def test_voxel_normals_recover_plane():
    """Voxel-PCA normals on a tilted noisy plane stay within ~2 deg."""
    import numpy as np
    import jax.numpy as jnp

    from icp_rust_tpu.ops.normals import estimate_normals_voxel

    rng = np.random.default_rng(0)
    n = 1500
    uv = rng.uniform(-2, 2, (n, 2))
    nrm = np.array([0.3, -0.5, 0.81])
    nrm /= np.linalg.norm(nrm)
    b1 = np.cross(nrm, [0, 0, 1.0])
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(nrm, b1)
    pts = (uv[:, :1] * b1 + uv[:, 1:] * b2 + np.array([0, 0, 5.0])
           + rng.normal(0, 0.003, (n, 3)))
    mask = np.ones(n, bool)
    nv, ok = estimate_normals_voxel(
        jnp.asarray(pts, jnp.float32), jnp.asarray(mask), 0.4
    )
    assert int(ok.sum()) > 0.9 * n
    est = np.asarray(nv)[np.asarray(ok)]
    ang = np.degrees(np.arccos(np.clip(np.abs(est @ nrm), 0, 1)))
    assert ang.mean() < 2.0
    # orientation: toward the origin (sensor below the plane at z=5)
    to_sensor = -pts[np.asarray(ok)]
    assert (np.sum(est * to_sensor, axis=1) >= 0).all()


def test_fused_p2l_kernel_matches_xla():
    """Fused Pallas p2l GN stats vs the XLA path (interpret on CPU)."""
    import jax.numpy as jnp

    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.ops import align3d
    from icp_rust_tpu.ops.align3d_pallas import assemble_p2l, p2l_stats_pallas

    rng = np.random.default_rng(11)
    n = 256
    src = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    dst = (src + rng.normal(0, 0.05, (n, 3))).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mask = rng.random(n) > 0.2
    t = RigidTransform3(
        jnp.asarray(np.eye(3, dtype=np.float32)),
        jnp.asarray(np.array([0.1, -0.05, 0.02], np.float32)),
    )

    ref = align3d.weighted_gn_update_p2l(
        t, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(normals),
        jnp.asarray(mask), 1.345,
    )
    stats = p2l_stats_pallas(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(normals),
        jnp.asarray(mask), t.rot, t.t, 1.345, interpret=True,
    )
    jtj, jtr, err, nf, sig = assemble_p2l(stats)
    x = np.linalg.solve(np.asarray(jtj), np.asarray(jtr))
    np.testing.assert_allclose(-x, np.asarray(ref.delta), rtol=5e-4,
                               atol=1e-6)
    np.testing.assert_allclose(float(err), float(ref.err), rtol=1e-5)
    assert int(nf) == int(mask.sum())


def test_whole_loop_p2l_kernel_matches_xla_loop():
    """Single-launch p2l loop kernel vs estimate_transform_p2l
    (interpret on CPU)."""
    import jax.numpy as jnp

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops import align3d
    from icp_rust_tpu.ops.align3d_pallas import estimate_transform_p2l_pallas

    rng = np.random.default_rng(5)
    n = 256
    src = jnp.asarray(rng.uniform(-2, 2, (n, 3)), jnp.float32)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    normals = jnp.asarray(normals, jnp.float32)
    dst = src + jnp.asarray(
        rng.normal(0, 0.02, (n, 3)), jnp.float32
    ) + jnp.asarray([0.1, -0.05, 0.03], jnp.float32)
    mask = jnp.asarray(rng.random(n) > 0.15)
    cfg = ICPConfig(compute_dtype=jnp.float32, align_backend="xla")
    t_ref = align3d.estimate_transform_p2l(src, dst, normals, mask, cfg)
    rot, t = estimate_transform_p2l_pallas(
        src, dst, normals, mask, cfg.huber_k, cfg.inner_delta_sq_tol,
        cfg.inner_max_iter, 1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=1e-6)


def test_p2l_fused_runner_matches_dispatch_loop():
    """run_odometry_p2l_fused (one lax.scan program) must reproduce the
    per-frame dispatch loop's trajectory (same per-frame computation,
    only the dispatch structure differs)."""
    from icp_rust_tpu.models.odometry import (
        run_odometry_p2l,
        run_odometry_p2l_fused,
    )

    rng = np.random.default_rng(11)
    base = _box_cloud(120, seed=3)
    frames = []
    for i in range(4):
        th = 0.02 * i
        c, s = np.cos(th), np.sin(th)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        t = np.array([0.03 * i, -0.02 * i, 0.0])
        frames.append((base @ r.T + t + rng.normal(0, 0.002, base.shape)))
    pts = np.stack(frames).astype(np.float64)
    msk = np.ones(pts.shape[:2], bool)

    _, path_loop = run_odometry_p2l(pts, msk, CFG, normals_voxel_size=0.5)
    _, path_fused = run_odometry_p2l_fused(
        pts, msk, CFG, normals_voxel_size=0.5
    )
    np.testing.assert_allclose(path_fused, path_loop, atol=1e-9)
