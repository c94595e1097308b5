#!/usr/bin/env python
"""Secondary benchmark: 2D odometry on the REAL reference dataset
(scans/2d, 210 frames, BASELINE.json configs[0]) on the active backend.

Prints one JSON line: frames/s + ATE vs the native C++ oracle."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.models.odometry import ate_rmse, run_odometry_fused
from icp_rust_tpu.utils import io as scan_io

SCANS = os.environ.get("SCANS2D", "/root/reference/scans/2d")
N_FRAMES = int(os.environ.get("BENCH2D_FRAMES", "210"))
ORACLE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "data", "oracle2d_path.npy"
)


def oracle_path(frames):
    if os.path.exists(ORACLE_CACHE):
        p = np.load(ORACLE_CACHE)
        if len(p) >= len(frames) - 1:
            return p[: len(frames) - 1]
    from icp_rust_tpu.native import oracle as native

    _, path = native.run_odometry2d(frames)
    os.makedirs(os.path.dirname(ORACLE_CACHE), exist_ok=True)
    np.save(ORACLE_CACHE, path)
    return path


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=N_FRAMES)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg = ICPConfig(
        compute_dtype=jnp.float32,
        point_scale=3000.0,
        det_rel_eps=1e-9,
        frame_backend=os.environ.get("BENCH_FRAME_BACKEND", "auto"),
    )
    pts_d = jax.block_until_ready(jnp.asarray(pts, cfg.compute_dtype))
    msk_d = jax.block_until_ready(jnp.asarray(mask))

    _ = run_odometry_fused(pts_d, msk_d, cfg)  # compile
    # Best-of-3 (tunnel jitter).
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, path = run_odometry_fused(pts_d, msk_d, cfg)
        dt = min(dt, time.perf_counter() - t0)
    fps = (len(frames) - 1) / dt

    ref = oracle_path(frames)
    ate = ate_rmse(path, ref)
    print(json.dumps({
        "metric": "icp2d_odometry_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "frames": len(frames),
        "ate_vs_oracle_mm": round(float(ate), 4),
        "ok": bool(ate < 10.0),  # well under one scan resolution (~mm)
    }))


if __name__ == "__main__":
    main()
