"""Scan-to-scan ICP drivers (2D, and 3D with planar motion).

Behavioral parity with reference src/lib.rs:

- ``icp2d`` = Icp2d::estimate (src/lib.rs:91-131): exactly ``outer_iters``
  iterations (the reference has NO outer convergence test), each doing
  (1) transform all src points by the current T, (2) exact 1-NN of each
  into dst, (3) ``estimate_transform`` on (transformed src, matched dst),
  (4) left-compose T <- dT o T.  The KdTree build has no analogue — the
  tiled sweep needs no index structure.
- ``icp3d_planar`` = Icp3d::estimate (src/lib.rs:133-174): correspondences
  found in 3D, optimization on the xy projection only, z untouched
  (transform_xy, src/lib.rs:52-57; get_xy, src/lib.rs:86-89).

The outer loop is a ``lax.scan`` of static length, so a whole ICP call jits
to a single XLA program.  Point clouds are fixed-shape with validity masks
(ragged scans are padded by utils.io).

Scale preconditioning: all coordinates are divided by config.point_scale on
entry and the result's translation is rescaled on exit.  With huber_k
co-scaled (done inside ops.align2d) this is mathematically exact — it only
changes floating-point conditioning, which is what float32 TPU runs need on
mm-scale data (config.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nearest_neighbor


def _scaled(x: Array, config: ICPConfig) -> Array:
    if config.point_scale == 1.0:
        return x
    return x / jnp.asarray(config.point_scale, x.dtype)


def _scale_transform(t: RigidTransform2, s: float) -> RigidTransform2:
    return RigidTransform2(rot=t.rot, t=t.t / s) if s != 1.0 else t


def _unscale_transform(t: RigidTransform2, s: float) -> RigidTransform2:
    return RigidTransform2(rot=t.rot, t=t.t * s) if s != 1.0 else t


def icp2d(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig = ICPConfig(),
) -> RigidTransform2:
    """2D scan-to-scan ICP. src/dst: (..., N|M, 2); masks over the point axes.

    Parity: reference Icp2d::estimate (src/lib.rs:105-130).
    """
    s = config.point_scale
    src = _scaled(src.astype(config.compute_dtype), config)
    dst = _scaled(dst.astype(config.compute_dtype), config)
    t0 = _scale_transform(
        initial_transform.astype(config.compute_dtype), s
    )

    def outer(t, _):
        src_t = t.apply_points(src)
        match = nearest_neighbor(
            src_t, dst, dst_mask, backend=config.nn_backend,
            tile=config.nn_dst_tile, method=config.nn_method,
        )
        matched = jnp.take_along_axis(dst, match.index[..., None], axis=-2)
        dt = align2d.estimate_transform(src_t, matched, src_mask, config)
        return dt.compose(t), None

    t, _ = jax.lax.scan(outer, t0, None, length=config.outer_iters)
    return _unscale_transform(t, s)


def icp3d_planar(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig = ICPConfig(),
) -> RigidTransform2:
    """3D matching, SE(2)-on-xy optimization (vehicle on the xy-plane).

    src/dst: (..., N|M, 3).  Parity: reference Icp3d::estimate
    (src/lib.rs:148-173): 1-NN in full 3D, solve on the xy projections,
    z passes through the transform untouched.
    """
    s = config.point_scale
    src = _scaled(src.astype(config.compute_dtype), config)
    dst = _scaled(dst.astype(config.compute_dtype), config)
    t0 = _scale_transform(
        initial_transform.astype(config.compute_dtype), s
    )

    def transform_xy(t: RigidTransform2, pts: Array) -> Array:
        xy = t.apply_points(pts[..., :2])
        return jnp.concatenate([xy, pts[..., 2:]], axis=-1)

    def outer(t, _):
        src_t = transform_xy(t, src)  # (..., N, 3)
        match = nearest_neighbor(
            src_t, dst, dst_mask, backend=config.nn_backend,
            tile=config.nn_dst_tile, method=config.nn_method,
        )
        matched = jnp.take_along_axis(dst, match.index[..., None], axis=-2)
        dt = align2d.estimate_transform(
            src_t[..., :2], matched[..., :2], src_mask, config
        )
        return dt.compose(t), None

    t, _ = jax.lax.scan(outer, t0, None, length=config.outer_iters)
    return _unscale_transform(t, s)
