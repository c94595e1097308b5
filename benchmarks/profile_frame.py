#!/usr/bin/env python
"""Decompose one 3D odometry frame's cost on the active backend.

Times, separately: (a) the exact 1-NN sweep (pallas + xla backends),
(b) one weighted GN update, (c) a full estimate_transform inner loop,
(d) a full icp3d_planar frame, (e) the per-iteration robust sigma
(masked median) alone.  Prints one line per timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import icp3d_planar
from icp_rust_tpu.ops import align2d, robust
from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
REPS = 5


def _fetch(out):
    # On the remote-relay TPU platform block_until_ready is not enough to
    # force execution; pull one leaf to host.
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0]).ravel()[:1]


def bench(name, fn, *args):
    _fetch(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        _fetch(fn(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    import os

    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    if not os.path.exists(path):
        scan_io.synthesize_scans3d(path, n_frames=4, seed=0)
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)

    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm = jnp.asarray(mask[0])
    dm = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    # (a) NN backends
    try:
        from icp_rust_tpu.ops.nn_pallas import nn_pallas

        f = jax.jit(lambda q, d, m: nn_pallas(q, d, m))
        bench("nn_pallas 28800x28800 D=3", f, src, dst, dm)
    except Exception as e:
        print("nn_pallas failed:", e)
    f = jax.jit(lambda q, d, m: nn_xla(q, d, m, tile=2048, method="direct"))
    bench("nn_xla direct", f, src, dst, dm)
    f = jax.jit(lambda q, d, m: nn_xla(q, d, m, tile=2048, method="mxu"))
    bench("nn_xla mxu HIGHEST", f, src, dst, dm)

    # (b) one weighted GN update (xy projection)
    t_id = RigidTransform2.identity(dtype=jnp.float32)
    f = jax.jit(lambda t, s, d, m: align2d.weighted_gauss_newton_update(
        t, s, d, m, cfg.huber_k, cfg.det_rel_eps))
    bench("weighted_gn_update (28800 pts)", f, t_id, src[:, :2], dst[:, :2], sm)

    # (e) robust sigma alone
    f = jax.jit(lambda r, m: robust.calc_stddevs(r, m))
    bench("calc_stddevs (median x2)", f, src[:, :2] - dst[:, :2], sm)

    # (c) full inner loop
    f = jax.jit(lambda s, d, m: align2d.estimate_transform(s, d, m, cfg))
    bench("estimate_transform (inner loop)", f, src[:, :2], dst[:, :2], sm)

    # (d) full frame
    f = jax.jit(lambda s, d, s_m, d_m, t: icp3d_planar(s, d, s_m, d_m, t, cfg))
    bench("icp3d_planar full frame (20 outer)", f, src, dst, sm, dm, t_id)


if __name__ == "__main__":
    main()
