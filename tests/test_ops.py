"""Parity tests for huber / robust stats / linalg vs reference semantics."""

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.ops import huber, linalg, robust

F64 = jnp.float64


# ---------------- huber (reference src/huber.rs:28-71) ---------------------


def test_huber_rho_branches():
    # Reference test_rho (src/huber.rs:33-37): rho operates on squared error.
    assert float(huber.rho(jnp.asarray(0.1 * 0.1, F64), 0.1)) == 0.1 * 0.1
    assert float(huber.rho(jnp.asarray(0.101 * 0.101, F64), 0.1)) == (
        2.0 * 0.1 * 0.101 - 0.1 * 0.1
    )
    assert float(huber.rho(jnp.asarray(0.09 * 0.09, F64), 0.1)) == 0.09 * 0.09


def test_huber_drho_is_derivative():
    # Finite-difference check, as in reference test_drho (src/huber.rs:40-69).
    for e0_sqrt, k in [(4.0, 4.0), (0.1, 4.0), (0.1, 0.1), (5.0, 4.0), (10.0, 4.0)]:
        e0 = e0_sqrt**2
        e1 = (e0_sqrt + 1e-5) ** 2
        fd = (
            float(huber.rho(jnp.asarray(e1, F64), k))
            - float(huber.rho(jnp.asarray(e0, F64), k))
        ) / (e1 - e0)
        assert abs(float(huber.drho(jnp.asarray(e0, F64), k)) - fd) < 1e-3


def test_huber_drho_at_zero_no_nan():
    assert float(huber.drho(jnp.asarray(0.0, F64), 1.345)) == 1.0


# ---------------- robust stats (reference src/stats.rs:62-181) -------------


def _median(vals):
    x = jnp.asarray(vals, F64)
    mask = jnp.ones(x.shape, dtype=bool)
    med, valid = robust.masked_median(x, mask)
    return float(med), bool(valid)


def test_median_matches_reference_cases():
    # Reference test_mutable_median (src/stats.rs:69-90).
    assert _median([-9., -6., -4., -1., -6., 5., 8., 5., 5., 4.]) == (1.5, True)
    assert _median(
        [15., 34., 26., -76., -19., 25., 93., -99., -52., 12., 6., -70., 59.,
         78., 69., -6., -33., 2., -27.]
    ) == (6.0, True)
    assert _median([-19., 38., -45., 35., 36., 68., 26., -27., 52., 41.]) == (
        35.5, True)
    assert _median([50.]) == (50.0, True)
    assert _median([10., 11.]) == (10.5, True)


def test_median_empty_invalid():
    x = jnp.zeros((4,), F64)
    med, valid = robust.masked_median(x, jnp.zeros((4,), bool))
    assert not bool(valid)


def test_median_respects_mask():
    # Padding lanes must not shift the median.
    x = jnp.asarray([10., 11., 9999., -9999.], F64)
    mask = jnp.asarray([True, True, False, False])
    med, valid = robust.masked_median(x, mask)
    assert (float(med), bool(valid)) == (10.5, True)


def test_mad_matches_reference_cases():
    # Reference test_mutable_mad (src/stats.rs:93-102).
    for vals, expected in [
        ([16., -16., -1., 8., -9., 4., -3., 17., 3., -7., 11., -1.], 7.5),
        ([22., 1., -9., -35., -29., -40., -50., -45., 4.], 20.0),
        ([-53., -36.], 8.5),
    ]:
        x = jnp.asarray(vals, F64)
        mad, valid = robust.masked_mad(x, jnp.ones(x.shape, bool))
        assert (float(mad), bool(valid)) == (expected, True)


def test_stddev_close_to_numpy_on_normal_sample():
    # Reference test_mutable_standard_deviation (src/stats.rs:105-136):
    # robust sigma of a N(50,10) sample within 0.5 of numpy.std.
    rng = np.random.default_rng(42)
    sample = rng.normal(50.0, 10.0, 100)
    sigma, valid = robust.masked_stddev(
        jnp.asarray(sample, F64), jnp.ones(100, bool)
    )
    assert bool(valid)
    assert abs(float(sigma) - np.std(sample)) < 1.0


def test_calc_stddevs_per_dimension():
    # Reference test_calc_stddevs (src/stats.rs:139-180) semantics: sigma is
    # computed independently per residual dimension.
    rng = np.random.default_rng(7)
    r = rng.normal(50.0, [10.0, 3.0], size=(500, 2))
    sigma, valid = robust.calc_stddevs(
        jnp.asarray(r, F64), jnp.ones(500, bool)
    )
    assert bool(valid)
    assert abs(float(sigma[0]) - 10.0) < 1.5
    assert abs(float(sigma[1]) - 3.0) < 0.5


def test_calc_stddevs_batched():
    rng = np.random.default_rng(3)
    r = rng.normal(0.0, 2.0, size=(4, 100, 2))
    mask = np.ones((4, 100), bool)
    mask[0, 50:] = False
    sigma, valid = robust.calc_stddevs(jnp.asarray(r, F64), jnp.asarray(mask))
    assert sigma.shape == (4, 2)
    assert bool(valid.all())
    # Lane 0 must equal the unbatched result on its valid prefix.
    s0, _ = robust.calc_stddevs(
        jnp.asarray(r[0, :50], F64), jnp.ones(50, bool)
    )
    np.testing.assert_allclose(np.asarray(sigma[0]), np.asarray(s0), rtol=0)


# ---------------- linalg (reference src/linalg.rs:31-73) -------------------


def test_inverse3x3_accuracy():
    m = jnp.asarray(
        [
            [-3.64867356, 0.11236464, -7.60555263],
            [-3.56881707, -9.77855129, 0.50475873],
            [-9.34728378, 0.25373179, -7.55422161],
        ],
        F64,
    )
    inv, ok = linalg.inverse3x3(m)
    assert bool(ok)
    err = np.abs(np.asarray(inv) @ np.asarray(m) - np.eye(3))
    assert err.max() < 1e-14


def test_inverse3x3_singular_returns_not_ok():
    _, ok = linalg.inverse3x3(jnp.zeros((3, 3), F64))
    assert not bool(ok)
    m = jnp.asarray(
        [[3.0, 1.0, 2.0], [6.0, 2.0, 4.0], [9.0, 9.0, 7.0]], F64
    )
    _, ok = linalg.inverse3x3(m)
    assert not bool(ok)


def test_inverse3x3_denormal_scale_f64():
    # Reference src/linalg.rs:62-71: a ~1e-40-entry matrix must still invert
    # in f64 (SURVEY.md flags this as f64/CPU-only).
    m = jnp.asarray(
        [
            [3.00792510e-38, -1.97985750e-45, 3.61627897e-44],
            [7.09699991e-49, -3.08764937e-49, -8.31427092e-41],
            [2.03723891e-42, -3.84594910e-42, 1.00872600e-40],
        ],
        F64,
    )
    inv, ok = linalg.inverse3x3(m)
    assert bool(ok)
    err = np.abs(np.asarray(inv) @ np.asarray(m) - np.eye(3))
    assert err.max() < 1e-14


def test_inverse3x3_batched():
    rng = np.random.default_rng(0)
    ms = rng.normal(size=(10, 3, 3))
    ms[3] = 0.0  # singular lane
    inv, ok = linalg.inverse3x3(jnp.asarray(ms, F64))
    assert inv.shape == (10, 3, 3)
    ok = np.asarray(ok)
    assert not ok[3] and ok[[0, 1, 2, 4, 5, 6, 7, 8, 9]].all()
    prod = np.einsum("bij,bjk->bik", np.asarray(inv), ms)
    for b in range(10):
        if ok[b]:
            assert np.abs(prod[b] - np.eye(3)).max() < 1e-10


def test_det_rel_eps_guards_near_singular():
    m = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1e-30]], F64
    )
    _, ok_exact = linalg.inverse3x3(m, det_rel_eps=0.0)
    _, ok_eps = linalg.inverse3x3(m, det_rel_eps=1e-6)
    assert bool(ok_exact) and not bool(ok_eps)


def test_sym3x3_eigh_smallest_matches_eigh():
    """Closed-form 3x3 eigensolver vs jnp.linalg.eigh on PSD matrices."""
    import numpy as np

    from icp_rust_tpu.ops.linalg import sym3x3_eigh_smallest

    rng = np.random.default_rng(0)
    a = rng.normal(size=(5000, 3, 3))
    cov = jnp.asarray(np.einsum("nij,nkj->nik", a, a))
    ev, v0 = sym3x3_eigh_smallest(cov)
    ev_ref, evec_ref = jnp.linalg.eigh(cov)
    np.testing.assert_allclose(np.asarray(ev), np.asarray(ev_ref),
                               rtol=1e-9, atol=1e-12)
    dot = jnp.abs(jnp.sum(v0 * evec_ref[..., :, 0], axis=-1))
    sep = (ev_ref[:, 1] - ev_ref[:, 0]) > 1e-6 * ev_ref[:, 2]
    assert float(jnp.min(jnp.where(sep, dot, 1.0))) > 1.0 - 1e-8


def test_sym3x3_eigh_smallest_degenerate_inputs_finite():
    """Isotropic / zero / rank-1 covariances: finite evals, no NaN."""
    import numpy as np

    from icp_rust_tpu.ops.linalg import sym3x3_eigh_smallest

    eye = jnp.eye(3)
    u = jnp.asarray([1.0, 2.0, -0.5])
    rank1 = jnp.outer(u, u)
    covs = jnp.stack([jnp.zeros((3, 3)), eye, 3.7 * eye, rank1])
    ev, v0 = sym3x3_eigh_smallest(covs)
    assert bool(jnp.all(jnp.isfinite(ev))), ev
    assert bool(jnp.all(jnp.isfinite(v0)))
    np.testing.assert_allclose(np.asarray(ev[1]), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ev[2]), 3.7, atol=1e-12)
    # rank-1: eigenvalues (0, 0, |u|^2)
    np.testing.assert_allclose(np.asarray(ev[3, :2]), 0.0, atol=1e-9)


def test_voxel_normals_reject_collinear_f32():
    """Exactly collinear voxels must NOT produce 'valid' normals in f32
    (the closed-form solver's f32 error floor sits near the old 1e-4
    planarity threshold — regression test for the raised gate)."""
    import numpy as np

    from icp_rust_tpu.ops.normals import estimate_normals_voxel

    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # 8 points per line segment, all inside one 0.5-voxel
    t = np.linspace(-0.2, 0.2, 8)[None, :, None]
    pts = (dirs[:, None, :] * t).reshape(-1, 3).astype(np.float32)
    # separate the lines so they land in different voxels
    offs = rng.uniform(-20, 20, (64, 1, 3)).astype(np.float32)
    pts = (dirs[:, None, :] * t + offs).reshape(-1, 3).astype(np.float32)
    n, valid = estimate_normals_voxel(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.5
    )
    frac_valid = float(jnp.mean(valid.astype(jnp.float32)))
    assert frac_valid < 0.05, frac_valid
