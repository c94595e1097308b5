"""Native C++ oracle: build, parity vs the NumPy oracle and vs the JAX engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import icp2d
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.utils import oracle_np as pyo

native = pytest.importorskip("icp_rust_tpu.native.oracle")

if not native.available():
    pytest.skip("native oracle could not be built", allow_module_level=True)


def test_estimate_transform_native_vs_numpy_vs_jax():
    rng = np.random.default_rng(0)
    src = rng.uniform(-10, 10, (80, 2))
    t_true = pyo.Transform.from_twist([0.5, -0.7, 0.12])
    dst = t_true.apply(src) + rng.normal(0, 0.02, (80, 2))

    rt = native.estimate_transform(src, dst)
    rot_n, t_n = native.rt_to_matrices(rt)
    t_p = pyo.estimate_transform(src, dst)
    np.testing.assert_allclose(rot_n, t_p.rot, atol=1e-13)
    np.testing.assert_allclose(t_n, t_p.t, atol=1e-13)

    t_j = align2d.estimate_transform(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(80, bool),
        REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), rot_n, atol=1e-11)
    np.testing.assert_allclose(np.asarray(t_j.t), t_n, atol=1e-11)


def test_icp2d_native_vs_jax():
    rng = np.random.default_rng(1)
    src = rng.uniform(-5, 5, (150, 2))
    t_true = pyo.Transform.from_twist([0.05, -0.02, 0.03])
    dst = t_true.apply(src) + rng.normal(0, 0.005, (150, 2))

    rt = native.icp2d_estimate(src, dst)
    rot_n, t_n = native.rt_to_matrices(rt)
    t_j = icp2d(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(150, bool), jnp.ones(150, bool),
        RigidTransform2.identity(dtype=jnp.float64), REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), rot_n, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t_j.t), t_n, atol=1e-9)


def test_icp3d_native_vs_numpy():
    rng = np.random.default_rng(2)
    src2 = rng.uniform(-3, 3, (200, 2))
    z = rng.uniform(0, 2, 200)
    src = np.column_stack([src2, z])
    t_true = pyo.Transform.from_twist([0.04, 0.01, -0.02])
    dst = np.column_stack([t_true.apply(src2), z]) + rng.normal(0, 0.002, (200, 3))

    rt = native.icp3d_estimate(src, dst)
    rot_n, t_n = native.rt_to_matrices(rt)
    t_p = pyo.Icp3d(dst).estimate(src, pyo.Transform.identity(), 20)
    np.testing.assert_allclose(rot_n, t_p.rot, atol=1e-12)
    np.testing.assert_allclose(t_n, t_p.t, atol=1e-12)
