#!/usr/bin/env python
"""2D odometry demo — the reference examples/scan2d.rs flow, headless.

Streams scans/2d frames, matches each against the FIRST frame
(warm-started from the previous estimate, reference scan2d.rs:65-88),
and saves the trajectory + scan overlay as a PNG instead of a live
piston window.

Run:  python examples/scan2d.py [--scans DIR] [--frames N] [--out PNG]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", default="/root/reference/scans/2d")
    ap.add_argument("--frames", type=int, default=210)
    ap.add_argument("--out", default="scan2d_trajectory.png")
    args = ap.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.models.odometry import run_odometry_fused
    from icp_rust_tpu.utils import io as scan_io

    frames = scan_io.load_scan2d_sequence(args.scans, limit=args.frames)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0,
                    det_rel_eps=1e-9)
    transforms, path = run_odometry_fused(pts, mask, cfg)
    print(f"{len(frames)} frames; final position {path[-1]}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 7))
    ax.scatter(frames[0][:, 0], frames[0][:, 1], s=1, c="tab:blue",
               label="frame 0 (fixed src)")
    last = frames[-1]
    # map the last frame back into frame 0's coordinates via T^-1
    rot = np.asarray(transforms.rot[-1])
    t = np.asarray(transforms.t[-1])
    back = (last - t) @ rot  # R^T applied from the right
    ax.scatter(back[:, 0], back[:, 1], s=1, c="tab:green",
               label="last frame (aligned)")
    ax.plot(path[:, 0], path[:, 1], "-", c="tab:red", lw=1.5,
            label="trajectory")
    ax.set_aspect("equal")
    ax.legend()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
