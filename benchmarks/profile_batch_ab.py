#!/usr/bin/env python
"""A/B the batched solve's NN backend end to end (auto vs pairs vs xla).

Also prints which backend 'auto' resolves to at the bench shape, since
the use_pairs_nn gate decides it (shared with the drivers' pre-sort).
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
from icp_rust_tpu.ops.nn import use_pairs_nn
from icp_rust_tpu.parallel.sharded import batched_icp2d
from icp_rust_tpu.utils import io as scan_io

SCANS = os.environ.get("SCANS2D", "/root/reference/scans/2d")


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=210)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    src = jnp.asarray(pts[:-1], jnp.float32)
    dst = jnp.asarray(pts[1:], jnp.float32)
    sm = jnp.asarray(mask[:-1])
    dm = jnp.asarray(mask[1:])
    b = src.shape[0]
    t0s = RigidTransform2.identity((b,), jnp.float32)
    print(f"platform={jax.devices()[0].platform} B={b} N={src.shape[1]}")
    print("use_pairs_nn(auto, batched) =",
          use_pairs_nn(src, dst, "auto", "direct"))

    # bench_batch methodology: REPS pipelined dispatches, ONE fetch
    # (amortizes the ~27 ms tunnel round trip), best-of-3.
    reps = 5
    results = {}
    for backend in ("auto", "pairs"):
        cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0,
                        det_rel_eps=1e-9, nn_backend=backend)
        run = jax.jit(lambda *a, cfg=cfg: batched_icp2d(*a, config=cfg))
        out = run(src, dst, sm, dm, t0s)
        np.asarray(out.t[0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = run(src, dst, sm, dm, t0s)
            np.asarray(out.t[0])
            best = min(best, (time.perf_counter() - t0) / reps)
        results[backend] = (best, np.asarray(out.t))
        print(f"{backend:8s} {best*1e3:8.2f} ms  -> {b/best:7.0f} pairs/s")
    d = np.max(np.abs(results["auto"][1] - results["pairs"][1]))
    print(f"max |t_auto - t_pairs| = {d:.3e}")


if __name__ == "__main__":
    main()
