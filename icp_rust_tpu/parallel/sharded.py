"""Sharded ICP: point-axis (sequence-parallel) and pair-axis (data-parallel).

No reference counterpart (the crate is single-threaded; SURVEY.md §2.3).

- ``sharded_estimate_transform`` / ``sharded_icp2d``: shard_map over a
  point-sharded mesh axis.  Local J^T J / J^T r partials reduce with psum
  (ops.align2d handles the collectives via ``axis_name``); correspondence
  search over the sharded destination cloud is the ring ppermute pass
  (parallel.ring_nn).  The returned transform is replicated.
- ``batched_icp2d``: natively-batched multi-pair ICP (icp2d is
  batch-polymorphic); with a mesh, jitted with NamedSharding on the pair
  axis so XLA partitions the program data-parallel
  (BASELINE.json configs[2]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import _is_identity, _outer_fixed_point, icp2d
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.parallel.ring_nn import (
    ring_nearest_neighbor,
    ring_nearest_neighbor_matched,
)


def sharded_estimate_transform(
    src: Array,
    dst: Array,
    mask: Array,
    config: ICPConfig,
    mesh: Mesh,
    point_axis: str = "sp",
) -> RigidTransform2:
    """Fixed-correspondence alignment with the point axis sharded over
    ``point_axis``.  src/dst: (N, 2) global; N must divide by the axis size.
    """

    def local(src_l, dst_l, mask_l):
        return align2d.estimate_transform(
            src_l, dst_l, mask_l, config, axis_name=point_axis
        )

    spec = P(point_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(),  # replicated transform
        check_vma=False,
    )
    return fn(src, dst, mask)


def sharded_icp2d(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig,
    mesh: Mesh,
    point_axis: str = "sp",
) -> RigidTransform2:
    """Full 2D ICP with BOTH clouds point-sharded over ``point_axis``.

    Queries stay local; destination shards rotate around the ring while
    every chip keeps a running argmin; the GN reduction psums.  Semantics
    match models.icp2d (same outer scan, same inner loop).
    """
    s = config.point_scale
    dtype = config.compute_dtype

    def local(src_l, dst_l, smask_l, dmask_l, t0: RigidTransform2):
        src_s = src_l.astype(dtype) / s
        dst_s = dst_l.astype(dtype) / s
        t0s = RigidTransform2(t0.rot.astype(dtype), t0.t.astype(dtype) / s)

        def outer(t):
            src_t = t.apply_points(src_s)
            # The matched-payload ring folds the winning point's
            # coordinates through the ppermute carry, so the destination
            # cloud is NEVER re-replicated (no all_gather): per-device
            # memory stays O(M/n) on the sharded axis.
            match, matched = ring_nearest_neighbor_matched(
                src_t, dst_s, dmask_l, point_axis, tile=config.nn_dst_tile
            )
            dt = align2d.estimate_transform(
                src_t, matched, smask_l, config, axis_name=point_axis
            )
            # dt is replicated across the point axis (psum'd solve), so
            # the fixed-point exit decision is consistent shard-wide and
            # the in-body collectives stay aligned.
            return dt.compose(t), _is_identity(dt)

        t, _ = _outer_fixed_point(outer, t0s, config.outer_iters)
        return RigidTransform2(t.rot, t.t * s)

    spec = P(point_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(src, dst, src_mask, dst_mask, initial_transform)


def dp_sp_icp2d(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig,
    mesh: Mesh,
    pair_axis: str = "dp",
    point_axis: str = "sp",
) -> RigidTransform2:
    """The full 2D training step over a 2D mesh: scan pairs data-parallel
    over ``pair_axis`` AND each pair's point clouds sharded over
    ``point_axis`` (ring NN + psum GN).  src/dst: (B, N, 2)."""
    s = config.point_scale
    dtype = config.compute_dtype

    def local(src_l, dst_l, smask_l, dmask_l, t0: RigidTransform2):
        src_s = src_l.astype(dtype) / s
        dst_s = dst_l.astype(dtype) / s
        t0s = RigidTransform2(t0.rot.astype(dtype), t0.t.astype(dtype) / s)

        def outer(t):
            src_t = t.apply_points(src_s)
            # The matched-payload ring folds the winning point's
            # coordinates through the ppermute carry, so the destination
            # cloud is NEVER re-replicated (no all_gather): per-device
            # memory stays O(M/n) on the sharded axis.
            match, matched = ring_nearest_neighbor_matched(
                src_t, dst_s, dmask_l, point_axis, tile=config.nn_dst_tile
            )
            dt = align2d.estimate_transform(
                src_t, matched, smask_l, config, axis_name=point_axis
            )
            # dt is replicated across the point axis (psum'd solve), so
            # the fixed-point exit decision is consistent shard-wide and
            # the in-body collectives stay aligned.
            return dt.compose(t), _is_identity(dt)

        t, _ = _outer_fixed_point(outer, t0s, config.outer_iters)
        return RigidTransform2(t.rot, t.t * s)

    pt = P(pair_axis, point_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pt, pt, pt, pt, P(pair_axis)),
        out_specs=P(pair_axis),
        check_vma=False,
    )
    return fn(src, dst, src_mask, dst_mask, initial_transform)


def batched_icp2d(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig,
    mesh: Mesh | None = None,
    pair_axis: str = "dp",
):
    """Multi-pair ICP: everything (including the initial transforms) carries
    a leading pair axis (B, ...).

    With a mesh, inputs/outputs are sharded over ``pair_axis`` and XLA
    partitions the program; without one it is a plain single-device call
    (icp2d handles the batch axis natively).
    """
    # icp2d is natively batch-polymorphic (batched while_loop carries,
    # batched NN, and the pair-vectorized fused GN kernel for ndim==3),
    # so the whole batch is ONE call — no vmap needed, and the GN kernel
    # runs one launch per inner iteration for ALL pairs.
    fn = partial(icp2d, config=config)
    if mesh is None:
        return fn(src, dst, src_mask, dst_mask, initial_transform)
    shard = NamedSharding(mesh, P(pair_axis))
    jitted = jax.jit(fn, in_shardings=shard, out_shardings=shard)
    return jitted(src, dst, src_mask, dst_mask, initial_transform)


def dp_sp_icp3d_planar(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform: RigidTransform2,
    config: ICPConfig,
    mesh: Mesh,
    pair_axis: str = "dp",
    point_axis: str = "sp",
) -> RigidTransform2:
    """The HEADLINE workload (reference src/lib.rs:133-174: 3D match /
    SE(2)-on-xy solve) over a 2D mesh: pairs data-parallel over
    ``pair_axis``, each pair's clouds point-sharded over ``point_axis``.
    src/dst: (B, N, 3).  The ring carries only the matched point's xy
    (the solve never reads z), the GN reduction psums."""
    s = config.point_scale
    dtype = config.compute_dtype

    def local(src_l, dst_l, smask_l, dmask_l, t0: RigidTransform2):
        src_s = src_l.astype(dtype) / s
        dst_s = dst_l.astype(dtype) / s
        t0s = RigidTransform2(t0.rot.astype(dtype), t0.t.astype(dtype) / s)

        def transform_xy(t, pts):
            xy = t.apply_points(pts[..., :2])
            return jnp.concatenate([xy, pts[..., 2:]], axis=-1)

        def outer(t):
            src_t = transform_xy(t, src_s)
            _, matched_xy = ring_nearest_neighbor_matched(
                src_t, dst_s, dmask_l, point_axis,
                tile=config.nn_dst_tile, payload=dst_s[..., :2],
            )
            dt = align2d.estimate_transform(
                src_t[..., :2], matched_xy, smask_l, config,
                axis_name=point_axis,
            )
            return dt.compose(t), _is_identity(dt)

        t, _ = _outer_fixed_point(outer, t0s, config.outer_iters)
        return RigidTransform2(t.rot, t.t * s)

    pt = P(pair_axis, point_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pt, pt, pt, pt, P(pair_axis)),
        out_specs=P(pair_axis),
        check_vma=False,
    )
    return fn(src, dst, src_mask, dst_mask, initial_transform)


def dp_sp_icp_p2l(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    initial_transform,
    config: ICPConfig,
    mesh: Mesh,
    pair_axis: str = "dp",
    point_axis: str = "sp",
    normals_voxel_size: float = 0.3,
):
    """SE(3) point-to-plane ICP over a 2D mesh (models.icp_p2l sharded).

    Normals are voxel-PCA per DESTINATION SHARD (each shard's voxel grid
    is anchored at its local minimum, so voxels straddling a shard
    boundary see only their side's points — a boundary-local stat
    approximation; interior voxels match the single-device result).  The
    ring payload is the 4-lane [normal, plane-offset] row of
    models/icp_p2l.py; the 6x6 GN reduction psums and sigma all_gathers
    (ops/align3d.py axis_name path).
    """
    from icp_rust_tpu.geometry.transform3d import RigidTransform3
    from icp_rust_tpu.models.icp_p2l import (
        build_p2l_payload,
        decode_p2l_payload,
    )
    from icp_rust_tpu.ops import align3d
    from icp_rust_tpu.ops.normals import estimate_normals_voxel

    s = config.point_scale
    dtype = config.compute_dtype

    def local(src_l, dst_l, smask_l, dmask_l, rot0, t0):
        src_s = src_l.astype(dtype) / s
        dst_s = dst_l.astype(dtype) / s
        t0s = RigidTransform3(rot0.astype(dtype), t0.astype(dtype) / s)

        fn_n = estimate_normals_voxel
        for _ in range(dst_s.ndim - 2):  # local pair axis -> vmap
            fn_n = jax.vmap(fn_n, in_axes=(0, 0, None))
        normals, n_valid = fn_n(dst_s, dmask_l, normals_voxel_size / s)
        payload = build_p2l_payload(dst_s, normals, n_valid, dmask_l,
                                    dtype)

        def outer(t):
            src_t = t.apply_points(src_s)
            match, pay = ring_nearest_neighbor_matched(
                src_t, dst_s, dmask_l, point_axis,
                tile=config.nn_dst_tile, payload=payload,
            )
            matched_n, matched, matched_ok = decode_p2l_payload(
                pay, match.dist_sq
            )
            pair_mask = smask_l & matched_ok
            dt = align3d.estimate_transform_p2l(
                src_t, matched, matched_n, pair_mask, config,
                axis_name=point_axis,
            )
            return dt.compose(t), _is_identity(dt)

        t, _ = _outer_fixed_point(outer, t0s, config.outer_iters)
        return t.rot, t.t * s

    pt = P(pair_axis, point_axis)
    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(pt, pt, pt, pt, P(pair_axis), P(pair_axis)),
        out_specs=(P(pair_axis), P(pair_axis)),
        check_vma=False,
    )
    rot, t = fn(
        src, dst, src_mask, dst_mask,
        initial_transform.rot, initial_transform.t,
    )
    return RigidTransform3(rot, t)
