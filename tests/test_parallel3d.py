"""dp x sp sharding for the 3D configs (virtual 8-device CPU mesh).

The headline workload (3D match / SE(2)-on-xy solve, reference
src/lib.rs:133-174) must scale: these verify the 2D-mesh drivers in
parallel/sharded.py against their single-device counterparts.
"""

import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import REFERENCE_CONFIG, ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models.icp2d import icp3d_planar
from icp_rust_tpu.models.icp_p2l import icp_point_to_plane
from icp_rust_tpu.parallel import make_mesh
from icp_rust_tpu.parallel.sharded import dp_sp_icp3d_planar, dp_sp_icp_p2l

F64 = jnp.float64


def _pair3d(n=256, seed=0, noise=0.01):
    """Cloud + planar (SE(2)-on-xy) motion of it, z preserved."""
    rng = np.random.default_rng(seed)
    src = rng.uniform(-10, 10, (n, 3))
    c, s = np.cos(0.08), np.sin(0.08)
    rot = np.array([[c, -s], [s, c]])
    dst = src.copy()
    dst[:, :2] = src[:, :2] @ rot.T + np.array([0.4, -0.3])
    dst += rng.normal(0, noise, dst.shape)
    return jnp.asarray(src, F64), jnp.asarray(dst, F64)


def test_dp_sp_icp3d_planar_matches_single_device():
    b, n = 2, 256
    src = np.zeros((b, n, 3))
    dst = np.zeros((b, n, 3))
    for k in range(b):
        s_, d_ = _pair3d(n, seed=20 + k)
        src[k], dst[k] = np.asarray(s_), np.asarray(d_)
    src, dst = jnp.asarray(src, F64), jnp.asarray(dst, F64)
    mask = jnp.ones((b, n), bool)
    t0 = RigidTransform2.identity((b,), dtype=F64)
    mesh = make_mesh(("dp", "sp"), (2, 4))

    t_sh = dp_sp_icp3d_planar(
        src, dst, mask, mask, t0, REFERENCE_CONFIG, mesh
    )
    for k in range(b):
        t_ref = icp3d_planar(
            src[k], dst[k], mask[k], mask[k],
            RigidTransform2.identity(dtype=F64), REFERENCE_CONFIG,
        )
        np.testing.assert_allclose(
            np.asarray(t_sh.rot[k]), np.asarray(t_ref.rot), atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(t_sh.t[k]), np.asarray(t_ref.t), atol=1e-12
        )


def _box_cloud(n, seed):
    """Points on a box's faces: full 6-DoF constraints for p2l."""
    rng = np.random.default_rng(seed)
    pts = []
    per = -(-n // 6)
    for axis in range(3):
        for sign in (-1.0, 1.0):
            p = rng.uniform(-1, 1, (per, 3))
            p[:, axis] = sign
            pts.append(p)
    out = np.concatenate(pts)[:n]
    return out[rng.permutation(len(out))]


def test_dp_sp_icp_p2l_recovers_and_matches_single_device():
    b, n = 2, 4096
    cfg = ICPConfig(compute_dtype=F64)
    t_true = RigidTransform3.from_twist(
        jnp.asarray([0.04, -0.03, 0.02, 0.02, -0.015, 0.025], F64)
    )
    src = np.zeros((b, n, 3))
    dst = np.zeros((b, n, 3))
    rng = np.random.default_rng(0)
    for k in range(b):
        cloud = _box_cloud(n, seed=30 + k)
        src[k] = cloud
        dst[k] = np.asarray(
            t_true.apply_points(jnp.asarray(cloud, F64))
        ) + rng.normal(0, 5e-4, (n, 3))
    src, dst = jnp.asarray(src, F64), jnp.asarray(dst, F64)
    mask = jnp.ones((b, n), bool)
    t0 = RigidTransform3.identity((b,), dtype=F64)
    mesh = make_mesh(("dp", "sp"), (2, 4))

    t_sh = dp_sp_icp_p2l(
        src, dst, mask, mask, t0, cfg, mesh, normals_voxel_size=0.5
    )
    for k in range(b):
        # Recovers the known transform...
        pred = np.asarray(
            RigidTransform3(t_sh.rot[k], t_sh.t[k]).apply_points(src[k])
        )
        want = np.asarray(t_true.apply_points(src[k]))
        assert np.linalg.norm(pred - want, axis=1).max() < 5e-3

        # ...and stays close to the single-device driver (per-shard voxel
        # grids are anchored at local minima, so boundary-voxel normals
        # differ slightly -> tolerance, not exactness).
        t_ref = icp_point_to_plane(
            src[k], dst[k], mask[k], mask[k],
            RigidTransform3.identity(dtype=F64), cfg,
            normals_voxel_size=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(t_sh.t[k]), np.asarray(t_ref.t), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(t_sh.rot[k]), np.asarray(t_ref.rot), atol=2e-3
        )
