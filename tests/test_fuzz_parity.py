"""Randomized parity fuzz: the f64 engine vs the reference-replay oracle
across problem shapes, motions, noise levels, and outlier fractions."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import icp2d
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.utils import oracle_np as oracle

F64 = jnp.float64

CASES = [
    # (seed, n_points, twist, noise, outlier_frac, coord_scale)
    (0, 64, [0.02, -0.01, 0.01], 0.002, 0.0, 1.0),
    (1, 200, [0.3, 0.2, 0.08], 0.01, 0.05, 5.0),
    (2, 333, [-0.1, 0.4, -0.05], 0.005, 0.1, 2.0),
    (3, 500, [1.0, -2.0, 0.02], 0.02, 0.0, 100.0),
    (4, 97, [0.0, 0.0, 0.15], 0.001, 0.02, 1.0),
    (5, 1024, [5.0, -3.0, 0.01], 0.5, 0.05, 1000.0),
]


def _problem(seed, n, twist, noise, outliers, scale):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-scale, scale, (n, 2))
    t_true = oracle.Transform.from_twist(twist)
    dst = t_true.apply(src) + rng.normal(0, noise, (n, 2))
    n_out = int(outliers * n)
    if n_out:
        dst[rng.choice(n, n_out, replace=False)] += rng.uniform(
            -scale, scale, (n_out, 2)
        )
    return src, dst


@pytest.mark.parametrize("case", CASES, ids=[f"seed{c[0]}" for c in CASES])
def test_estimate_transform_fuzz(case):
    seed, n, twist, noise, outliers, scale = case
    src, dst = _problem(seed, n, twist, noise, outliers, scale)
    t_o = oracle.estimate_transform(src, dst)
    t_j = align2d.estimate_transform(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(n, bool),
        REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), t_o.rot, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(t_j.t), t_o.t, atol=1e-10 * max(scale, 1.0)
    )


@pytest.mark.parametrize("case", CASES[:4], ids=[f"seed{c[0]}" for c in CASES[:4]])
def test_icp2d_fuzz(case):
    seed, n, twist, noise, outliers, scale = case
    src, dst = _problem(seed, n, twist, noise, outliers, scale)
    t_o = oracle.Icp2d(dst).estimate(src, oracle.Transform.identity(), 20)
    t_j = icp2d(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(n, bool), jnp.ones(n, bool),
        RigidTransform2.identity(dtype=F64), REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), t_o.rot, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(t_j.t), t_o.t, atol=1e-8 * max(scale, 1.0)
    )
