"""Fused Pallas GN kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.align2d_pallas import assemble_update, gn_stats_pallas


def _problem(seed=0, n=256, masked=True):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
    th = 0.15
    c, s = np.cos(th), np.sin(th)
    rot = np.array([[c, -s], [s, c]], np.float32)
    dst = src @ rot.T + np.array([0.3, -0.2], np.float32)
    dst += rng.normal(0, 0.05, dst.shape).astype(np.float32)
    dst[::17] += 3.0  # outliers exercise the Huber branch
    mask = (rng.random(n) > 0.2) if masked else np.ones(n, bool)
    return (jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask))


def test_fused_gn_matches_xla():
    src, dst, mask = _problem()
    t = RigidTransform2(
        jnp.asarray(np.eye(2, dtype=np.float32)),
        jnp.asarray(np.zeros(2, np.float32)),
    )
    k = 1.345

    ref = align2d.weighted_gauss_newton_update(t, src, dst, mask, k)

    stats = gn_stats_pallas(src, dst, mask, t.rot, t.t, k, interpret=True)
    jtj, jtr, err, nf, sig_x, sig_y = assemble_update(stats, t.rot)
    from icp_rust_tpu.ops import linalg

    x, ok = linalg.solve3x3(jtj, jtr, 0.0)
    np.testing.assert_allclose(np.asarray(-x), np.asarray(ref.delta),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(err), float(ref.err), rtol=1e-5)
    assert int(nf) == int(mask.sum())

    # sigma cross-check vs the jnp robust path
    from icp_rust_tpu.ops import robust

    r = align2d.residuals(t, src, dst)
    sig_ref, _ = robust.calc_stddevs(r, mask)
    np.testing.assert_allclose(
        [float(sig_x), float(sig_y)], np.asarray(sig_ref), rtol=1e-6
    )


def test_fused_gn_rotated_transform():
    """Non-identity transform: the R-dependent Jacobian factorization."""
    src, dst, mask = _problem(seed=3)
    th = -0.4
    c, s = np.cos(th), np.sin(th)
    t = RigidTransform2(
        jnp.asarray(np.array([[c, -s], [s, c]], np.float32)),
        jnp.asarray(np.array([0.4, 0.1], np.float32)),
    )
    ref = align2d.weighted_gauss_newton_update(t, src, dst, mask, 1.345)
    stats = gn_stats_pallas(src, dst, mask, t.rot, t.t, 1.345,
                            interpret=True)
    jtj, jtr, err, nf, *_ = assemble_update(stats, t.rot)
    from icp_rust_tpu.ops import linalg

    x, ok = linalg.solve3x3(jtj, jtr, 0.0)
    assert bool(ok) == bool(ref.ok)
    np.testing.assert_allclose(np.asarray(-x), np.asarray(ref.delta),
                               rtol=2e-4, atol=1e-6)


def test_fused_inner_loop_via_config():
    """estimate_transform with align_backend=pallas (interpret on CPU)
    converges to the same transform as the XLA path."""
    from icp_rust_tpu.config import ICPConfig

    src, dst, mask = _problem(seed=7, n=384, masked=False)
    cfg_x = ICPConfig(compute_dtype=jnp.float32, align_backend="xla")
    t_ref = align2d.estimate_transform(src, dst, mask, cfg_x)
    # interpret=True is not plumbed through config; call the pallas update
    # directly in a small loop to emulate estimate_transform's body.
    t = RigidTransform2.identity(dtype=jnp.float32)
    prev = jnp.float32(np.finfo(np.float32).max)
    for _ in range(cfg_x.inner_max_iter):
        upd = align2d.weighted_gn_update_pallas(
            t, src, dst, mask, cfg_x.huber_k, interpret=True
        )
        d2 = float(jnp.sum(upd.delta**2))
        if not bool(upd.ok) or d2 < cfg_x.inner_delta_sq_tol:
            break
        if float(upd.err) > float(prev):
            break
        prev = upd.err
        t = RigidTransform2.from_twist(upd.delta).compose(t)
    np.testing.assert_allclose(np.asarray(t.rot), np.asarray(t_ref.rot),
                               rtol=0, atol=5e-5)
    np.testing.assert_allclose(np.asarray(t.t), np.asarray(t_ref.t),
                               rtol=0, atol=5e-5)


def test_whole_loop_kernel_matches_xla_loop():
    """The single-launch inner-loop kernel reproduces estimate_transform
    (interpret mode on CPU): rot exact, t to f32 roundoff."""
    import numpy as np

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops.align2d_pallas import estimate_transform_pallas

    rng = np.random.default_rng(0)
    n = 384
    src = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    c, s_ = np.cos(0.1), np.sin(0.1)
    dst = src @ jnp.asarray([[c, s_], [-s_, c]], jnp.float32) + jnp.asarray(
        [0.2, -0.1], jnp.float32)
    dst = dst + jnp.asarray(rng.normal(0, 0.02, (n, 2)), jnp.float32)
    mask = jnp.asarray(rng.random(n) > 0.15)
    cfg = ICPConfig(compute_dtype=jnp.float32, det_rel_eps=1e-9,
                    align_backend="xla")
    t_ref = align2d.estimate_transform(src, dst, mask, cfg)
    rot, t = estimate_transform_pallas(
        src, dst, mask, cfg.huber_k, cfg.det_rel_eps,
        cfg.inner_delta_sq_tol, cfg.inner_max_iter, 1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=1e-6)


def test_whole_loop_kernel_degenerate_inputs():
    """Degenerate input (perfect fit -> sigma 0 -> not ok) returns
    identity, matching the XLA loop's Option::None semantics."""
    import numpy as np

    from icp_rust_tpu.ops.align2d_pallas import estimate_transform_pallas

    src = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (128, 2)),
                      jnp.float32)
    rot, t = estimate_transform_pallas(
        src, src, jnp.ones(128, bool), 1.345, 1e-9, 1e-6, 200, 1.0,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(rot), np.eye(2,
                                                          dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(t), np.zeros(2, np.float32))


def test_batched_kernel_matches_per_pair():
    """gn_stats_pallas_batched == per-pair kernel, incl. masked rows."""
    import numpy as np

    from icp_rust_tpu.ops.align2d_pallas import (
        gn_stats_pallas,
        gn_stats_pallas_batched,
    )

    rng = np.random.default_rng(0)
    B, N = 4, 256
    src = jnp.asarray(rng.uniform(-2, 2, (B, N, 2)), jnp.float32)
    dst = src + jnp.asarray(rng.normal(0, 0.1, (B, N, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((B, N)) > 0.2)
    # odd/even valid counts + one fully-masked row
    mask = mask.at[3].set(False)
    th = 0.2
    c, s_ = np.cos(th), np.sin(th)
    rot = jnp.broadcast_to(
        jnp.asarray([[c, -s_], [s_, c]], jnp.float32), (B, 2, 2))
    t = jnp.asarray(rng.normal(0, 0.1, (B, 2)), jnp.float32)
    got = gn_stats_pallas_batched(src, dst, mask, rot, t, 1.345,
                                  interpret=True)
    for i in range(B):
        want = gn_stats_pallas(src[i], dst[i], mask[i], rot[i], t[i],
                               1.345, interpret=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   rtol=2e-6, atol=1e-7)


def test_batched_whole_loop_kernel_matches_xla_loop():
    """estimate_transform_pallas_batched (block-desynchronized whole
    inner loop) == the XLA batched loop, incl. a fully-masked pair."""
    import numpy as np

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.ops.align2d_pallas import (
        estimate_transform_pallas_batched,
    )

    rng = np.random.default_rng(0)
    b, n = 5, 384
    src = jnp.asarray(rng.uniform(-2, 2, (b, n, 2)), jnp.float32)
    c, s_ = np.cos(0.1), np.sin(0.1)
    dst = src @ jnp.asarray([[c, s_], [-s_, c]], jnp.float32) + jnp.asarray(
        [0.2, -0.1], jnp.float32)
    dst = dst + jnp.asarray(rng.normal(0, 0.02, (b, n, 2)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.15)
    mask = mask.at[3].set(False)
    cfg = ICPConfig(compute_dtype=jnp.float32, det_rel_eps=1e-9,
                    align_backend="xla")
    t_ref = align2d.estimate_transform(src, dst, mask, cfg)
    rot, t = estimate_transform_pallas_batched(
        src, dst, mask, cfg.huber_k, cfg.det_rel_eps,
        cfg.inner_delta_sq_tol, cfg.inner_max_iter, 1.0, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rot), np.asarray(t_ref.rot),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref.t),
                               atol=1e-6)
    # fully-masked pair -> identity (Option::None semantics)
    np.testing.assert_array_equal(np.asarray(rot[3]),
                                  np.eye(2, dtype=np.float32))
    np.testing.assert_array_equal(np.asarray(t[3]),
                                  np.zeros(2, np.float32))
