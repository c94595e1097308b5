#!/usr/bin/env python
"""Compare per-frame dispatch loop vs fused whole-sequence odometry."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.models.odometry import (
    run_odometry_device,
    run_odometry_fused,
)
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
N_FRAMES = 12


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    if not os.path.exists(path):
        scan_io.synthesize_scans3d(path, n_frames=N_FRAMES, seed=0)
    frames = scan_io.load_scans3d_hdf5(path)[:N_FRAMES]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    nn_backend = os.environ.get("NN", "xla")
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9, nn_backend=nn_backend)
    print(f"platform={jax.devices()[0].platform} frames={N_FRAMES} "
          f"nn={nn_backend}")

    for name, fn in [("device-loop", run_odometry_device),
                     ("fused-scan", run_odometry_fused)]:
        _, p = fn(pts[:3], mask[:3], cfg)  # warm-up compile (small F)
        _, p = fn(pts, mask, cfg)          # warm-up compile (full F)
        t0 = time.perf_counter()
        _, p = fn(pts, mask, cfg)
        dt = time.perf_counter() - t0
        fps = (N_FRAMES - 1) / dt
        print(f"{name:14s} {dt*1e3:8.1f} ms  {fps:6.2f} frames/s  "
              f"path[-1]={p[-1]}")


if __name__ == "__main__":
    main()
