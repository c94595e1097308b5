#!/usr/bin/env python
"""Scan-to-submap odometry benchmark (BASELINE.json configs[3]): each
frame aligns against a rolling voxel-downsampled local map instead of
the first frame.  Prints one JSON line (frames/s + ATE vs ground truth)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.models.submap import run_submap_odometry
from icp_rust_tpu.utils import io as scan_io

# 96 frames: one fused device program is timed, and the remote tunnel
# charges a fixed ~27 ms dispatch+fetch per host-timed call — at 12
# frames that fixed cost shaved ~10-30% off the recorded frames/s.
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "96"))
PAD_TO = 28800
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "scans3d.hdf5")


def main():
    frames, traj = scan_io.ensure_scans3d(DATA, N_FRAMES, seed=0)
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    pts_d = jax.block_until_ready(jnp.asarray(pts, cfg.compute_dtype))
    msk_d = jax.block_until_ready(jnp.asarray(mask))

    # 96 frames accumulate ~54k unique 0.05-m cells; at 1<<16 the load
    # factor hit 0.82 and 8-probe exhaustion dropped 156k points
    # (spatially biased map truncation -> ATE 1.7 m).  1<<17 keeps the
    # load at ~0.41 (~0.41^8 ~ 0.08% new-cell drop odds) and the 131k
    # map view still fits the list kernel's VMEM-resident db (~4.2 MB).
    # view_rows=1<<16: the NN db carries only the first 65536 rows of
    # the Morton-sorted map view (valid cells first; ~54k occupied at
    # 96 frames) instead of all 131072 — exact while occupancy fits,
    # guarded by the runner's hidden-cells warning.
    kw = dict(voxel_size=0.05, capacity=1 << 17, view_rows=1 << 16)
    _ = run_submap_odometry(pts_d[:3], msk_d[:3], cfg, **kw)  # compile
    _ = run_submap_odometry(pts_d, msk_d, cfg, **kw)
    # Best-of-3 (tunnel jitter).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, path = run_submap_odometry(pts_d, msk_d, cfg, **kw)
        dt = min(dt, time.perf_counter() - t0)
    fps = (N_FRAMES - 1) / dt

    # Submap transforms map scan -> map frame; ground truth sensor
    # positions in the frame of frame 0:
    c, s = np.cos(traj[0, 2]), np.sin(traj[0, 2])
    gt = (traj[1:, :2] - traj[0, :2]) @ np.array([[c, -s], [s, c]])
    err = np.linalg.norm(path[:, :2] - gt, axis=1)
    ate = float(np.sqrt((err ** 2).mean()))
    print(json.dumps({
        "metric": "icp3d_submap_odometry_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "frames": N_FRAMES,
        "ate_vs_ground_truth_m": round(ate, 4),
        "ok": bool(ate < 0.05),
    }))


if __name__ == "__main__":
    main()
