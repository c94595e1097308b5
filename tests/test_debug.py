"""Numeric-safety utilities (utils/debug.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.config import ICPConfig, REFERENCE_CONFIG
from icp_rust_tpu.utils import debug


def test_assert_all_finite_passes_and_raises():
    debug.assert_all_finite({"a": jnp.ones(3), "b": [jnp.zeros(2)]})
    with pytest.raises(FloatingPointError, match="non-finite"):
        debug.assert_all_finite(jnp.asarray([1.0, np.nan]))


def test_checked_wrapper():
    @debug.checked
    def bad(x):
        return x / 0.0

    with pytest.raises(FloatingPointError):
        bad(jnp.ones(2))


def test_deterministic_repeat():
    from icp_rust_tpu.ops.nn import nn_xla

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.uniform(-1, 1, (64, 2)), jnp.float32)
    d = jnp.asarray(rng.uniform(-1, 1, (128, 2)), jnp.float32)
    debug.deterministic_repeat(lambda: nn_xla(q, d))


def test_drift_gate_alignment():
    """f32 vs f64 alignment drift on a synthetic pair stays tiny."""
    from icp_rust_tpu.geometry.transform2d import RigidTransform2
    from icp_rust_tpu.models.icp2d import icp2d

    rng = np.random.default_rng(1)
    src = rng.uniform(-2, 2, (256, 2))
    c, s = np.cos(0.05), np.sin(0.05)
    dst = src @ np.array([[c, s], [-s, c]]) + [0.1, -0.05]
    mask = np.ones(256, bool)

    def run(cfg):
        t = icp2d(
            jnp.asarray(src, cfg.compute_dtype),
            jnp.asarray(dst, cfg.compute_dtype),
            jnp.asarray(mask), jnp.asarray(mask),
            RigidTransform2.identity(dtype=cfg.compute_dtype), cfg,
        )
        return (np.concatenate([np.asarray(t.t).ravel(),
                                np.asarray(t.rot).ravel()]),)

    drift = debug.drift_gate(
        run, ICPConfig(compute_dtype=jnp.float32), REFERENCE_CONFIG,
        atol=1e-3,
    )
    assert drift < 1e-3
