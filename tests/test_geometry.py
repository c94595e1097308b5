"""Parity tests for the Lie-group layer.

Golden values are computed live with scipy.linalg.expm/logm — the same
oracle the reference used to generate its hard-coded expectations
(reference src/se2.rs:86-141 documents the scipy snippets).  The specific
twist values from the reference tests are also exercised.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from icp_rust_tpu.geometry import se2, se3, so2, so3
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3


def skew_se2(v):
    return np.array([[0.0, -v[2], v[0]], [v[2], 0.0, v[1]], [0.0, 0.0, 0.0]])


def skew_se3(p):
    v, w = p[:3], p[3:]
    m = np.zeros((4, 4))
    m[:3, :3] = np.array(
        [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
    )
    m[:3, 3] = v
    return m


# Twists exercised by the reference's own golden tests (src/se2.rs:95,111,127)
# plus edge cases theta=0 and theta=pi (src/se2.rs:170-199).
SE2_TWISTS = [
    [-0.29638466, -0.15797957, -0.89885138],
    [-0.24295876, 0.95847196, 0.91052553],
    [10.0, -20.0, 0.0],
    [2.89271776, 0.34275002, -1.6427056],
    [-1.0, 3.0, np.pi],
    [-1.0, 3.0, 0.0],
    [0.5, -0.25, 1e-9],
    [0.1, 0.2, -np.pi + 1e-7],
]


@pytest.mark.parametrize("twist", SE2_TWISTS)
def test_se2_exp_matches_scipy_expm(twist):
    ours = np.asarray(se2.exp(jnp.asarray(twist, dtype=jnp.float64)))
    expected = expm(skew_se2(np.asarray(twist)))
    np.testing.assert_allclose(ours, expected, atol=1e-9)


@pytest.mark.parametrize("twist", SE2_TWISTS)
def test_se2_log_roundtrip(twist):
    m = se2.exp(jnp.asarray(twist, dtype=jnp.float64))
    back = np.asarray(se2.log(m))
    tw = np.asarray(twist)
    # theta = pi maps to atan2 branch cut: compare the transform, not the twist.
    m2 = np.asarray(se2.exp(jnp.asarray(back)))
    np.testing.assert_allclose(m2, np.asarray(m), atol=1e-9)
    if abs(abs(tw[2]) - np.pi) > 1e-6:
        np.testing.assert_allclose(back, tw, atol=1e-6)


def test_se2_exp_batched_matches_loop():
    twists = jnp.asarray(SE2_TWISTS, dtype=jnp.float64)
    batched = np.asarray(se2.exp(twists))
    for i, tw in enumerate(SE2_TWISTS):
        single = np.asarray(se2.exp(jnp.asarray(tw, dtype=jnp.float64)))
        np.testing.assert_allclose(batched[i], single, atol=0)


def test_so2_log_exp_roundtrip():
    # Reference src/so2.rs:51-66 checks log(exp(theta)) over +-pi.
    for theta in [0.3 * np.pi, 0.8 * np.pi, -0.7 * np.pi, -0.1 * np.pi, 0.0]:
        rot = so2.exp(jnp.float64(theta))
        assert abs(float(so2.log(rot)) - theta) < 1e-12


def test_se2_get_rt():
    # Reference src/se2.rs:203-221.
    m = jnp.asarray(
        [
            [0.6225093, 0.7826124, -0.32440305],
            [-0.7826124, 0.6225093, -0.01307704],
            [0.0, 0.0, 1.0],
        ],
        dtype=jnp.float64,
    )
    rot, t = se2.get_rt(m)
    np.testing.assert_array_equal(np.asarray(rot), np.asarray(m)[:2, :2])
    np.testing.assert_array_equal(np.asarray(t), [-0.32440305, -0.01307704])


def test_se2_small_theta_stable_in_f32():
    # The reference's exact theta==0 branch misses tiny nonzero theta where
    # 1-cos underflows in f32; our Taylor branch must stay accurate.
    tw32 = jnp.asarray([1.0, -2.0, 1e-5], dtype=jnp.float32)
    rot, t = se2.calc_rt(tw32)
    expected = expm(skew_se2(np.array([1.0, -2.0, 1e-5])))
    np.testing.assert_allclose(np.asarray(t), expected[:2, 2], atol=1e-5)


# ---------------- Transform (reference src/transform.rs tests) -------------


def test_transform_apply():
    # Reference src/transform.rs:62-70.
    r = so2.exp(jnp.float64(np.pi / 2))
    t = jnp.asarray([3.0, 6.0], dtype=jnp.float64)
    tf = RigidTransform2.from_rt(r, t)
    out = np.asarray(tf.apply(jnp.asarray([4.0, 2.0], dtype=jnp.float64)))
    np.testing.assert_allclose(out, [-2.0 + 3.0, 4.0 + 6.0], atol=1e-12)


def test_transform_inverse():
    # Reference src/transform.rs:73-80.
    r = so2.exp(jnp.float64(np.pi / 2))
    t = jnp.asarray([3.0, 6.0], dtype=jnp.float64)
    tf = RigidTransform2.from_rt(r, t).inverse()
    out = np.asarray(tf.apply(jnp.asarray([1.0, 10.0], dtype=jnp.float64)))
    np.testing.assert_allclose(out, [4.0, 2.0], atol=1e-12)


def test_transform_compose_matches_nested_apply():
    # Reference src/transform.rs:83-96.
    t1 = RigidTransform2.from_rt(
        so2.exp(jnp.float64(np.pi / 4)), jnp.asarray([2.0, 1.0])
    ).inverse()
    t2 = RigidTransform2.from_rt(
        so2.exp(jnp.float64(np.pi / 2)), jnp.asarray([5.0, 3.0])
    ).inverse()
    x = jnp.asarray([-5.0, 6.0], dtype=jnp.float64)
    pa = np.asarray(t1.apply(t2.apply(x)))
    pb = np.asarray((t1 @ t2).apply(x))
    np.testing.assert_allclose(pa, pb, atol=1e-12)


def test_transform_twist_log_roundtrip():
    tw = jnp.asarray([0.7, -1.3, 0.4], dtype=jnp.float64)
    tf = RigidTransform2.from_twist(tw)
    np.testing.assert_allclose(np.asarray(tf.log()), np.asarray(tw), atol=1e-12)


# ---------------- SO(3)/SE(3) ----------------------------------------------

SE3_TWISTS = [
    [0.1, -0.2, 0.3, 0.4, -0.5, 0.6],
    [1.0, 2.0, 3.0, 0.0, 0.0, 0.0],
    [0.5, 0.1, -0.7, 1e-9, -1e-9, 1e-9],
    [-0.3, 0.8, 0.2, 2.0, -1.0, 0.5],
    [0.0, 0.0, 1.0, 0.0, 0.0, 3.14],
]


@pytest.mark.parametrize("twist", SE3_TWISTS)
def test_se3_exp_matches_scipy(twist):
    ours = np.asarray(se3.exp(jnp.asarray(twist, dtype=jnp.float64)))
    expected = expm(skew_se3(np.asarray(twist)))
    np.testing.assert_allclose(ours, expected, atol=1e-9)


@pytest.mark.parametrize("twist", SE3_TWISTS)
def test_se3_log_roundtrip(twist):
    m = se3.exp(jnp.asarray(twist, dtype=jnp.float64))
    back = se3.log(m)
    m2 = np.asarray(se3.exp(back))
    np.testing.assert_allclose(m2, np.asarray(m), atol=1e-8)


def test_so3_log_near_pi():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        for theta in [np.pi, np.pi - 1e-5, np.pi - 1e-8]:
            w = jnp.asarray(theta * axis, dtype=jnp.float64)
            r = so3.exp(w)
            w_back = so3.log(r)
            r2 = np.asarray(so3.exp(w_back))
            np.testing.assert_allclose(r2, np.asarray(r), atol=1e-6)


def test_transform3_roundtrips():
    tw = jnp.asarray(SE3_TWISTS[0], dtype=jnp.float64)
    tf = RigidTransform3.from_twist(tw)
    np.testing.assert_allclose(np.asarray(tf.log()), np.asarray(tw), atol=1e-10)
    p = jnp.asarray([0.3, -4.0, 2.5], dtype=jnp.float64)
    np.testing.assert_allclose(
        np.asarray(tf.inverse().apply(tf.apply(p))), np.asarray(p), atol=1e-12
    )
    comp = tf @ tf.inverse()
    np.testing.assert_allclose(np.asarray(comp.rot), np.eye(3), atol=1e-12)
