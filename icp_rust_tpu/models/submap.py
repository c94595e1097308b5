"""Scan-to-submap odometry (BASELINE.json configs[3]).

No reference counterpart — the reference matches scan-to-first-scan
forever (examples/scan2d.rs:65-88), which drifts once overlap with frame 1
shrinks.  Here each incoming scan is aligned against a rolling,
voxel-downsampled local map held in the odometry frame; the aligned scan's
points are then merged into the map and the union is re-voxelized back to
fixed capacity.  Everything is fixed-shape and jitted once; the map lives
on device across frames.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import icp2d, icp3d_planar
from icp_rust_tpu.ops.voxel import voxel_downsample


@functools.partial(
    jax.jit, static_argnames=("config", "voxel_size", "capacity")
)
def submap_step(
    map_pts: Array,
    map_mask: Array,
    scan: Array,
    scan_mask: Array,
    t_prev: RigidTransform2,
    config: ICPConfig,
    voxel_size: float,
    capacity: int,
):
    """Align one scan to the map, then merge it in.

    Returns (t_new, map_pts', map_mask').  The transform maps scan (sensor
    frame) -> odometry/map frame; note this is the INVERSE convention of
    the reference drivers (which map first-frame -> current-frame), chosen
    so map insertion is a plain apply.
    """
    dim = scan.shape[-1]
    driver = icp2d if dim == 2 else icp3d_planar
    # ICP estimates map->scan? We align scan points INTO the map: treat the
    # scan as src and the map as dst; the estimated transform takes scan
    # points to their map positions.
    t = driver(scan, map_pts, scan_mask, map_mask, t_prev, config)
    if dim == 2:
        scan_in_map = t.apply_points(scan.astype(map_pts.dtype))
    else:
        xy = t.apply_points(scan[..., :2].astype(map_pts.dtype))
        scan_in_map = jnp.concatenate(
            [xy, scan[..., 2:].astype(map_pts.dtype)], axis=-1
        )
    merged = jnp.concatenate([map_pts, scan_in_map], axis=0)
    merged_mask = jnp.concatenate([map_mask, scan_mask], axis=0)
    vox = voxel_downsample(merged, merged_mask, voxel_size, capacity)
    return t, vox.points, vox.mask, vox.n_cells


def run_submap_odometry(
    frames: np.ndarray,
    masks: np.ndarray,
    config: ICPConfig = ICPConfig(),
    voxel_size: float = 0.05,
    capacity: int = 16384,
) -> Tuple[List[RigidTransform2], np.ndarray]:
    """frames: (F, N, D) padded; masks: (F, N).  Frame 0 seeds the map.
    Returns (transforms scan->map per frame, trajectory (F-1, D2) of sensor
    positions in the map frame)."""
    # NOTE: do NOT fuse this loop into a lax.scan over frames — measured
    # 40x SLOWER on TPU (0.45 vs 18.9 frames/s): the voxel argsort +
    # scatter-add inside a scan body lowers catastrophically, unlike the
    # pure-ICP odometry scan (models/odometry.py), which fuses fine.
    dtype = config.compute_dtype
    pts = jnp.asarray(frames, dtype)
    msk = jnp.asarray(masks)
    vox = voxel_downsample(pts[0], msk[0], voxel_size, capacity)
    map_pts, map_mask = vox.points, vox.mask
    t = RigidTransform2.identity(dtype=dtype)
    transforms, path, cells = [], [], [vox.n_cells]
    for i in range(1, pts.shape[0]):
        t, map_pts, map_mask, n_cells = submap_step(
            map_pts, map_mask, pts[i], msk[i], t, config, voxel_size,
            capacity,
        )
        transforms.append(t)
        path.append(t.t)  # sensor position in map frame
        cells.append(n_cells)
    max_cells = int(np.max(np.asarray(jnp.stack(cells))))
    if max_cells > capacity:
        import warnings

        warnings.warn(
            f"submap voxel capacity overflow: {max_cells} occupied cells "
            f"> capacity {capacity}; the map was truncated (spatially "
            f"biased) — grow `capacity` or the voxel size",
            RuntimeWarning,
            stacklevel=2,
        )
    return transforms, np.asarray(jnp.stack(path))
