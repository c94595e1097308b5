"""The hoisted loop-invariant src sort (models.icp2d.presort_src) must be
bitwise-identical to the in-driver sort: the sequence runners hoist frame 0's
Morton sort out of their per-frame loop (reference examples/scan2d.rs:65,88
keeps frame 0 as the fixed src forever), and the hoist is only legal because
presort_src applies the drivers' own permutation (computed on the scaled
view, so scale-after-permute == permute-after-scale)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models.icp2d import icp2d, icp3d_planar, presort_src
from icp_rust_tpu.models.icp_p2l import icp_point_to_plane


def _frames(dim, n=512, seed=0):
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim).astype(np.float32) * 2.0
    th = 0.03
    c, s = np.cos(th), np.sin(th)
    if dim == 2:
        rot = np.array([[c, -s], [s, c]], np.float32)
        shift = np.array([0.05, -0.02], np.float32)
    else:
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        shift = np.array([0.05, -0.02, 0.0], np.float32)
    return base, base @ rot.T + shift


def _cfg(point_scale=1.0):
    return ICPConfig(
        compute_dtype=jnp.float32,
        point_scale=point_scale,
        det_rel_eps=1e-9,
        nn_sort="morton",
        nn_backend="xla",
    )


@pytest.mark.parametrize("point_scale", [1.0, 1000.0])
@pytest.mark.parametrize("dim", [2, 3])
def test_presorted_driver_bitwise(dim, point_scale):
    src, dst = _frames(dim)
    cfg = _cfg(point_scale)
    msk = jnp.ones((src.shape[0],), bool)
    t0 = RigidTransform2.identity(dtype=jnp.float32)
    driver = icp2d if dim == 2 else icp3d_planar
    s2, m2, pre = presort_src(jnp.asarray(src), msk, jnp.asarray(src), cfg)
    assert pre
    ta = driver(s2, jnp.asarray(dst), m2, msk, t0, cfg, src_presorted=True)
    tb = driver(jnp.asarray(src), jnp.asarray(dst), msk, msk, t0, cfg)
    assert np.array_equal(np.asarray(ta.rot), np.asarray(tb.rot))
    assert np.array_equal(np.asarray(ta.t), np.asarray(tb.t))


def test_presorted_p2l_bitwise():
    src, dst = _frames(3)
    cfg = _cfg()
    msk = jnp.ones((src.shape[0],), bool)
    t0 = RigidTransform3.identity(dtype=jnp.float32)
    s2, m2, pre = presort_src(jnp.asarray(src), msk, jnp.asarray(src), cfg)
    assert pre
    ta = icp_point_to_plane(s2, jnp.asarray(dst), m2, msk, t0, cfg,
                            normals_voxel_size=0.5, src_presorted=True)
    tb = icp_point_to_plane(jnp.asarray(src), jnp.asarray(dst), msk, msk,
                            t0, cfg, normals_voxel_size=0.5)
    assert np.array_equal(np.asarray(ta.rot), np.asarray(tb.rot))
    assert np.array_equal(np.asarray(ta.t), np.asarray(tb.t))


def test_presort_noop_when_sort_disabled():
    # The f64 parity preset never sorts; presort_src must pass through.
    src, dst = _frames(2)
    cfg = ICPConfig()  # default: nn_sort auto + xla backend on CPU -> None
    msk = jnp.ones((src.shape[0],), bool)
    s2, m2, pre = presort_src(jnp.asarray(src), msk, jnp.asarray(dst), cfg)
    assert not pre
    assert np.array_equal(np.asarray(s2), src)
