"""Sequential scan odometry — the reference examples' end-to-end flow.

Parity with reference examples/scan2d.rs:56-115 and scan3d.rs:104-131:
frame 1 is the src kept fixed forever; each later frame becomes dst; the
estimate is warm-started from the previous transform; the trajectory is the
translation of T^-1 per frame.

The per-frame ICP call is jitted once for the padded scan shape and reused
across the sequence; frames stream through host->device transfers while the
previous step computes (XLA dispatch is async).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import icp2d, icp3d_planar
from icp_rust_tpu.utils import io as scan_io


def run_odometry(
    frames: Sequence[np.ndarray],
    config: ICPConfig = ICPConfig(),
    pad_multiple: int | None = None,
) -> Tuple[List[RigidTransform2], np.ndarray]:
    """Run scan-to-first-scan odometry over a frame sequence.

    frames: list of (N_i, 2) or (N_i, 3) arrays.  Returns (transforms,
    trajectory (F-1, 2)).  Dim 3 uses the planar 3D driver
    (3D matching / SE(2) solve), mirroring examples/scan3d.rs.
    """
    dim = frames[0].shape[1]
    pts, mask = scan_io.pad_points(
        frames, multiple=pad_multiple or config.pad_multiple
    )
    driver = icp2d if dim == 2 else icp3d_planar

    @jax.jit
    def step(src, src_mask, dst, dst_mask, t_prev: RigidTransform2):
        return driver(src, dst, src_mask, dst_mask, t_prev, config)

    dtype = config.compute_dtype
    src = jnp.asarray(pts[0], dtype)
    src_mask = jnp.asarray(mask[0])
    t = RigidTransform2.identity(dtype=dtype)
    transforms, path = [], []
    for i in range(1, len(frames)):
        t = step(src, src_mask, jnp.asarray(pts[i], dtype), jnp.asarray(mask[i]), t)
        inv = t.inverse()
        transforms.append(t)
        path.append(np.asarray(inv.t, dtype=np.float64))
    return transforms, np.asarray(path)


def ate_rmse(path_a: np.ndarray, path_b: np.ndarray) -> float:
    """Absolute trajectory error (RMSE over per-frame position error)."""
    d = np.linalg.norm(path_a - path_b, axis=-1)
    return float(np.sqrt(np.mean(d * d)))
