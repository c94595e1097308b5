#!/usr/bin/env python
"""3D odometry demo — the reference examples/scan3d.rs flow, headless.

Reads (or synthesizes) an HDF5 sequence in the reference reader's schema
(75 packets x 384 points per frame, ||p|| > 0.2 range filter,
examples/scan3d.rs:34-69,104), runs planar-motion 3D ICP odometry
(3D matching, SE(2) solve — reference src/lib.rs:133-174), and saves the
xy trajectory overlay as a PNG.

Run:  python examples/scan3d.py [--hdf5 FILE] [--frames N] [--out PNG]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hdf5", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "data", "scans3d.hdf5"))
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--out", default="scan3d_trajectory.png")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.models.odometry import run_odometry_fused
    from icp_rust_tpu.utils import io as scan_io

    if not os.path.exists(args.hdf5):
        os.makedirs(os.path.dirname(args.hdf5), exist_ok=True)
        scan_io.synthesize_scans3d(args.hdf5, n_frames=args.frames, seed=0)
    frames = scan_io.load_scans3d_hdf5(args.hdf5)[: args.frames]
    pts, mask = scan_io.pad_points(frames, pad_to=28800)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    _, path = run_odometry_fused(pts, mask, cfg)
    print(f"{len(frames)} frames; final position {path[-1]}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(frames[0][:, 0], frames[0][:, 1], s=0.5, c="tab:blue",
               alpha=0.4, label="frame 0 (xy)")
    ax.plot(path[:, 0], path[:, 1], "-o", c="tab:red", ms=3,
            label="trajectory")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
