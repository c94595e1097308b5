"""Trajectory/transform parity: JAX engine (f64 CPU) vs the NumPy oracle
that replays the reference algorithm exactly.

The oracle stands in for running the Rust crate (no cargo in this image;
see utils/oracle_np.py).  f64-vs-f64 agreement here is tight; the TPU f32
path is gated by ATE tolerance in the benchmark harness instead.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from icp_rust_tpu.config import REFERENCE_CONFIG
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models import icp2d
from icp_rust_tpu.models.odometry import ate_rmse, run_odometry
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.utils import io as scan_io
from icp_rust_tpu.utils import oracle_np as oracle

SCANS_2D = "/root/reference/scans/2d"
F64 = jnp.float64


def test_estimate_transform_matches_oracle_exactly():
    rng = np.random.default_rng(0)
    src = rng.uniform(-10, 10, (50, 2))
    t_true = oracle.Transform.from_twist([0.5, -0.7, 0.12])
    dst = t_true.apply(src) + rng.normal(0, 0.02, (50, 2))

    t_o = oracle.estimate_transform(src, dst)
    t_j = align2d.estimate_transform(
        jnp.asarray(src), jnp.asarray(dst), jnp.ones(50, bool), REFERENCE_CONFIG
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), t_o.rot, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_j.t), t_o.t, atol=1e-12)


def test_icp2d_matches_oracle_on_synthetic():
    rng = np.random.default_rng(1)
    src = rng.uniform(-5, 5, (120, 2))
    t_true = oracle.Transform.from_twist([0.05, -0.02, 0.03])
    dst = t_true.apply(src) + rng.normal(0, 0.005, (120, 2))

    t_o = oracle.Icp2d(dst).estimate(src, oracle.Transform.identity(), 20)
    t_j = icp2d(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(120, bool), jnp.ones(120, bool),
        RigidTransform2.identity(dtype=F64), REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), t_o.rot, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t_j.t), t_o.t, atol=1e-9)


@pytest.mark.slow
def test_odometry_matches_oracle_on_real_scans_prefix():
    frames = scan_io.load_scan2d_sequence(SCANS_2D, limit=16)
    # Reference example starts at 001.txt (index=1 on first draw call,
    # examples/scan2d.rs:69-71); 000.txt is unused there. Match that.
    frames = frames[1:]
    _, path_o = oracle.run_odometry2d(frames)
    _, path_j = run_odometry(frames, REFERENCE_CONFIG)
    err = ate_rmse(path_o, path_j)
    # mm-scale data spanning +-3000; agreement far below scan resolution.
    assert err < 1e-3, f"ATE RMSE vs oracle = {err}"


def test_icp3d_planar_matches_oracle_on_synthetic():
    """3D matching / SE(2) solve parity (reference src/lib.rs:133-174)."""
    from icp_rust_tpu.models.icp2d import icp3d_planar

    rng = np.random.default_rng(2)
    src = rng.uniform(-5, 5, (150, 3))
    src[:, 2] = rng.uniform(0.2, 1.8, 150)
    t_true = oracle.Transform.from_twist([0.04, -0.03, 0.02])
    dst = src.copy()
    dst[:, :2] = t_true.apply(src[:, :2])
    dst += rng.normal(0, 0.004, dst.shape)

    t_o = oracle.Icp3d(dst).estimate(src, oracle.Transform.identity(), 20)
    t_j = icp3d_planar(
        jnp.asarray(src), jnp.asarray(dst),
        jnp.ones(150, bool), jnp.ones(150, bool),
        RigidTransform2.identity(dtype=F64), REFERENCE_CONFIG,
    )
    np.testing.assert_allclose(np.asarray(t_j.rot), t_o.rot, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t_j.t), t_o.t, atol=1e-9)


def test_odometry3d_matches_native_oracle():
    """3D sequential odometry trajectory vs the native C++ oracle (f64)."""
    from icp_rust_tpu.native import oracle as native

    if not native.available():
        pytest.skip("native lib not built")
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        h5 = os.path.join(d, "s.hdf5")
        scan_io.synthesize_scans3d(h5, n_frames=5, seed=3)
        frames = scan_io.load_scans3d_hdf5(h5)
    _, path_o = native.run_odometry3d(frames)
    _, path_j = run_odometry(frames, REFERENCE_CONFIG)
    err = ate_rmse(path_o, path_j)
    assert err < 1e-9, f"ATE RMSE vs native 3D oracle = {err}"
