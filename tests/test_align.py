"""Parity tests for the GN alignment core and the ICP drivers.

Mirrors the reference's synthetic-ground-truth strategy (src/lib.rs tests,
SURVEY.md §4): build dst = T_true(src) (+ the reference's hard-coded noise
table), perturb, and assert error contraction / per-point recovery.
"""

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import icp2d, icp3d_planar
from icp_rust_tpu.ops import align2d

F64 = jnp.float64
CFG = REFERENCE_CONFIG


def tf(param):
    return RigidTransform2.from_twist(jnp.asarray(param, F64))


def full_mask(n):
    return jnp.ones((n,), dtype=bool)


# Point set from reference test_gauss_newton_update (src/lib.rs:328-334).
GN_SRC = np.array(
    [
        [-8.76116663, 3.50338231],
        [-5.21184804, -1.91561705],
        [6.63141168, 4.8915293],
        [-2.29215281, -4.72658399],
        [6.81352587, -0.81624617],
    ]
)

# Point set + noise table from reference test_weighted_gauss_newton_update
# (src/lib.rs:438-484; one large-noise outlier pair deliberately excluded
# there as well).
WGN_SRC = np.array(
    [
        [-8.89304516, 0.54202289],
        [-4.03198385, -2.81807802],
        [-5.92679530, 9.62339266],
        [-4.04966218, -4.44595403],
        [-2.86369420, -9.13843999],
        [-6.97749644, -8.90180581],
        [-9.66454985, 6.32282424],
        [7.02264007, -0.88684585],
        [4.19700110, -1.42366424],
        [-0.68034875, -0.48699014],
        [1.89645382, 1.86119400],
        [7.09550743, 2.18289525],
        [-7.95383118, -5.16650913],
        [-5.40235599, 2.70675665],
        [-5.38909696, -5.48180288],
        [-9.00498232, -5.12191142],
        [-8.54899319, -3.25752055],
        [6.89969814, 3.53276123],
        [5.06875729, -0.28918540],
    ]
)
WGN_NOISE = np.array(
    [
        [0.01058790, 0.01302535],
        [0.01392508, 0.00835860],
        [0.01113885, -0.00693269],
        [0.01673124, -0.01735564],
        [-0.01219263, 0.00080933],
        [-0.00396817, 0.00111582],
        [-0.00444043, 0.00658505],
        [-0.01576271, -0.00701065],
        [0.00464000, -0.00406790],
        [0.00269374, -0.00787015],
        [-0.00494243, 0.00350137],
        [0.00343766, -0.00039311],
        [0.00661565, -0.00341112],
        [-0.00936695, -0.00673899],
        [-0.00240039, -0.00314409],
        [-0.01434128, -0.00585390],
        [0.00874225, 0.00295633],
        [0.00736213, -0.00328875],
        [0.00585082, -0.01232619],
    ]
)


def test_residual_zero_at_truth():
    # Reference test_residual (src/lib.rs:268-274).
    t = tf([-10.0, 20.0, 0.01])
    src = jnp.asarray([[7.0, 8.0]], F64)
    dst = t.apply_points(src)
    r = align2d.residuals(t, src, dst)
    np.testing.assert_array_equal(np.asarray(r), 0.0)


def test_error_is_sum_of_squared_residuals():
    # Reference test_error (src/lib.rs:277-297).
    src = jnp.asarray([[-6.0, 9.0], [-1.0, 9.0], [-4.0, -4.0]], F64)
    dst = jnp.asarray([[-4.0, 4.0], [0.0, 3.0], [-3.0, -8.0]], F64)
    t = tf([10.0, 20.0, 0.01])
    r = np.asarray(align2d.residuals(t, src, dst))
    expected = (r**2).sum()
    got = float(align2d.error(t, src, dst, full_mask(3)))
    assert abs(got - expected) < 1e-12


def test_gauss_newton_update_input_size_gates():
    # Reference src/lib.rs:300-318: n=0 and n=1 -> None; n=2 -> Some.
    t = tf([10.0, 30.0, -0.15])
    pts = jnp.asarray(
        [[-8.89304516, 0.54202289], [-4.03198385, -2.81807802]], F64
    )
    dst = t.apply_points(pts)
    for n_valid, expect_ok in [(0, False), (1, False), (2, True)]:
        mask = jnp.arange(2) < n_valid
        upd = align2d.gauss_newton_update(t, pts, dst, mask)
        assert bool(upd.ok) == expect_ok


def test_gauss_newton_update_contracts_error():
    # Reference test_gauss_newton_update (src/lib.rs:321-351): one plain GN
    # step from a perturbed start reduces the error by >100x.
    true_param = np.array([10.0, 30.0, -0.15])
    dparam = np.array([0.3, -0.5, 0.001])
    t_true = tf(true_param)
    t_init = tf(true_param + dparam)
    src = jnp.asarray(GN_SRC, F64)
    dst = t_true.apply_points(src)
    upd = align2d.gauss_newton_update(t_init, src, dst, full_mask(len(GN_SRC)))
    assert bool(upd.ok)
    t_upd = tf(true_param + dparam + np.asarray(upd.delta))
    e0 = float(align2d.error(t_init, src, dst, full_mask(len(GN_SRC))))
    e1 = float(align2d.error(t_upd, src, dst, full_mask(len(GN_SRC))))
    assert e1 < e0 * 0.01


def test_weighted_gauss_newton_degenerate_gates():
    # Reference src/lib.rs:354-401: n<=2 -> not ok (perfect fit makes
    # sigma=0 in both dims); rank-deficient 3-point sets -> not ok.
    t = tf([10.0, 30.0, -0.15])
    for pts in [
        np.zeros((0, 2)),
        [[-8.89304516, 0.54202289]],
        [[-8.89304516, 0.54202289], [-4.03198385, -2.81807802]],
        [
            [-8.89304516, 0.54202289],
            [-4.03198385, -2.81807802],
            [-4.03198385, -2.81807802],
        ],
        [
            [-8.89304516, 0.54202289],
            [-4.03198385, -2.81807802],
            [4.40356349, -9.43358563],
        ],
    ]:
        pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
        n = max(len(pts), 1)
        padded = np.zeros((4, 2))
        padded[: len(pts)] = pts
        src = jnp.asarray(padded, F64)
        dst = t.apply_points(src)
        mask = jnp.arange(4) < len(pts)
        upd = align2d.weighted_gauss_newton_update(
            t, src, dst, mask, CFG.huber_k
        )
        assert not bool(upd.ok), pts


def test_weighted_gauss_newton_zero_x_diff_not_ok():
    # Reference src/lib.rs:404-427: collinear (x=0) points -> singular.
    src = np.stack([np.zeros(6), np.arange(6) * 0.1], axis=1)
    t_true = tf([0.0, 0.01, 0.0])
    dst = t_true.apply_points(jnp.asarray(src, F64))
    t0 = tf([0.0, 0.0, 0.0])
    upd = align2d.weighted_gauss_newton_update(
        t0, jnp.asarray(src, F64), dst, full_mask(6), CFG.huber_k
    )
    assert not bool(upd.ok)


def test_weighted_gauss_newton_contracts_error_with_noise():
    # Reference test_weighted_gauss_newton_update (src/lib.rs:430-507).
    true_param = np.array([10.0, 30.0, -0.15])
    dparam = np.array([0.3, -0.5, 0.001])
    t_true = tf(true_param)
    t_init = tf(true_param + dparam)
    src = jnp.asarray(WGN_SRC, F64)
    dst = t_true.apply_points(src) + jnp.asarray(WGN_NOISE, F64)
    mask = full_mask(len(WGN_SRC))

    upd = align2d.weighted_gauss_newton_update(
        t_init, src, dst, mask, CFG.huber_k
    )
    assert bool(upd.ok)
    t_upd = tf(true_param + dparam + np.asarray(upd.delta))
    e0 = float(align2d.error(t_init, src, dst, mask))
    e1 = float(align2d.error(t_upd, src, dst, mask))
    assert e1 < e0 * 0.1

    # Full inner loop from identity: >1000x contraction (src/lib.rs:502-506).
    t_est = align2d.estimate_transform(src, dst, mask, CFG)
    e1 = float(align2d.error(t_est, src, dst, mask))
    assert e1 < e0 * 0.001


def test_estimate_transform_degenerate_input_returns_identity():
    # All-masked input: loop must stop immediately at identity, not NaN.
    src = jnp.zeros((8, 2), F64)
    t = align2d.estimate_transform(src, src, jnp.zeros(8, bool), CFG)
    np.testing.assert_allclose(np.asarray(t.rot), np.eye(2))
    np.testing.assert_allclose(np.asarray(t.t), 0.0)


def test_estimate_transform_batched_matches_single():
    rng = np.random.default_rng(11)
    src = rng.uniform(-10, 10, (3, 30, 2))
    params = np.array([[0.3, -0.2, 0.1], [-0.5, 0.8, -0.05], [0.0, 0.0, 0.0]])
    dst = np.stack(
        [
            np.asarray(tf(p).apply_points(jnp.asarray(s, F64)))
            for p, s in zip(params, src)
        ]
    )
    dst += rng.normal(0, 0.01, dst.shape)
    mask = jnp.ones((3, 30), bool)
    t_batch = align2d.estimate_transform(
        jnp.asarray(src, F64), jnp.asarray(dst, F64), mask, CFG
    )
    for b in range(3):
        t_single = align2d.estimate_transform(
            jnp.asarray(src[b], F64), jnp.asarray(dst[b], F64),
            jnp.ones(30, bool), CFG,
        )
        # The batched while_loop runs extra no-op iterations for lanes that
        # finished early; results must agree to fp-exactness of frozen lanes.
        np.testing.assert_allclose(
            np.asarray(t_batch.rot[b]), np.asarray(t_single.rot), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(t_batch.t[b]), np.asarray(t_single.t), atol=1e-12
        )


# ---------------- full ICP drivers (reference src/lib.rs:510-595) ----------


def _l_shape_2d():
    ys = np.arange(11) * 0.1
    xs = np.arange(1, 11) * 0.1
    pts = np.concatenate(
        [np.stack([np.zeros(11), ys], 1), np.stack([xs, np.zeros(10)], 1)]
    )
    return pts


def test_icp_2dscan_recovers_transform():
    # Reference test_icp_2dscan (src/lib.rs:554-595).
    src = jnp.asarray(_l_shape_2d(), F64)
    t_true = tf([0.01, 0.01, -0.02])
    dst = t_true.apply_points(src)
    noise = tf([0.05, 0.010, 0.010])
    t_init = noise.compose(t_true)
    n = src.shape[0]
    t_pred = icp2d(src, dst, full_mask(n), full_mask(n), t_init, CFG)
    pred = np.asarray(t_pred.apply_points(src))
    err = np.linalg.norm(pred - np.asarray(dst), axis=1)
    assert err.max() < 1e-3


def test_icp_3dscan_recovers_transform():
    # Reference test_icp_3dscan (src/lib.rs:510-551): two wall segments at
    # different z; matching in 3D, solve on xy.
    pts2d = _l_shape_2d()
    z = np.where(pts2d[:, 0] == 0.0, 2.0, 1.0)
    src = jnp.asarray(np.column_stack([pts2d, z]), F64)
    t_true = tf([0.01, 0.01, -0.02])

    def transform_xy(t, pts):
        xy = t.apply_points(pts[..., :2])
        return jnp.concatenate([xy, pts[..., 2:]], axis=-1)

    dst = transform_xy(t_true, src)
    noise = tf([0.05, 0.010, 0.010])
    t_init = noise.compose(t_true)
    n = src.shape[0]
    t_pred = icp3d_planar(src, dst, full_mask(n), full_mask(n), t_init, CFG)
    pred = np.asarray(transform_xy(t_pred, src))
    err = np.linalg.norm(pred - np.asarray(dst), axis=1)
    assert err.max() < 1e-3


def test_icp_2d_with_padding_matches_unpadded():
    # Masked padding must be bit-neutral to the solve.
    src = _l_shape_2d()
    t_true = tf([0.01, 0.01, -0.02])
    dst = np.asarray(t_true.apply_points(jnp.asarray(src, F64)))
    n = len(src)
    pad_to = 64
    src_p = np.zeros((pad_to, 2))
    src_p[:n] = src
    dst_p = np.full((pad_to, 2), 1e9)  # junk far away; masked out
    dst_p[:n] = dst
    mask_s = jnp.arange(pad_to) < n
    t_init = tf([0.05, 0.01, 0.01]).compose(t_true)
    t_a = icp2d(
        jnp.asarray(src, F64), jnp.asarray(dst, F64),
        full_mask(n), full_mask(n), t_init, CFG,
    )
    t_b = icp2d(
        jnp.asarray(src_p, F64), jnp.asarray(dst_p, F64),
        mask_s, mask_s, t_init, CFG,
    )
    np.testing.assert_allclose(
        np.asarray(t_a.t), np.asarray(t_b.t), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(t_a.rot), np.asarray(t_b.rot), atol=1e-12
    )


def test_icp_2d_scaled_f32_close_to_f64():
    # point_scale preconditioning: f32 + scaling must land near the f64
    # answer on data with large coordinates.
    rng = np.random.default_rng(5)
    src = rng.uniform(-3000, 3000, (200, 2))
    t_true = tf([5.0, -8.0, 0.01])
    dst = np.asarray(t_true.apply_points(jnp.asarray(src, F64)))
    mask = full_mask(200)
    t_init = RigidTransform2.identity(dtype=F64)
    t64 = icp2d(jnp.asarray(src), jnp.asarray(dst), mask, mask, t_init, CFG)
    cfg32 = CFG.with_(compute_dtype=jnp.float32, point_scale=3000.0,
                      det_rel_eps=1e-9)
    t32 = icp2d(jnp.asarray(src), jnp.asarray(dst), mask, mask, t_init, cfg32)
    # Transforms should agree to ~f32 resolution at the data scale.
    np.testing.assert_allclose(
        np.asarray(t32.t), np.asarray(t64.t), atol=0.2
    )
    np.testing.assert_allclose(
        np.asarray(t32.rot), np.asarray(t64.rot), atol=1e-4
    )
