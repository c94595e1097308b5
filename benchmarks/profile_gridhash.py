#!/usr/bin/env python
"""Grid-hash NN on the bench workload: timing + exactness census."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.ops.gridhash import build_grid, nn_gridhash
from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 10


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    dm = jnp.asarray(mask[1])
    sm = np.asarray(mask[0])
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    ref = nn_xla(src, dst, dm)
    ref_idx = np.asarray(ref.index)
    ref_d = np.asarray(ref.dist_sq)
    print(f"brute NN dist: med={np.median(np.sqrt(ref_d[sm])):.4f} "
          f"p99={np.quantile(np.sqrt(ref_d[sm]), 0.99):.4f} "
          f"max={np.sqrt(ref_d[sm]).max():.4f}")

    for r, cap, tbl in ((0.1, 8, 15), (0.15, 16, 15), (0.25, 16, 15),
                        (0.25, 32, 16), (0.5, 32, 16)):
        grid = jax.jit(
            lambda d, m, rr=r, c=cap, t=tbl: build_grid(
                d, m, rr, table_size=1 << t, bucket_cap=c)
        )(dst, dm)
        res = jax.jit(
            lambda q, g, c=cap: nn_gridhash(q, g, bucket_cap=c)
        )(src, grid)
        d = np.asarray(res.dist_sq)
        found = np.isfinite(d) & sm
        ok = (np.asarray(res.index)[found] == ref_idx[found]).mean()
        notfound = (~np.isfinite(d) & sm).mean()

        # timing: chained queries (grid built once)
        def q_chain(q, g):
            def body(i, carry):
                qq, acc = carry
                rr = nn_gridhash(qq, g, bucket_cap=cap)
                return (qq + 1e-12 * acc, acc + rr.dist_sq[0])
            _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
            return acc

        f = jax.jit(q_chain)
        np.asarray(f(src, grid))
        t0 = time.perf_counter()
        np.asarray(f(src, grid))
        dt = (time.perf_counter() - t0) / CHAIN

        # build timing
        fb = jax.jit(lambda d, m: build_grid(
            d, m, r, table_size=1 << tbl, bucket_cap=cap).starts[0])
        np.asarray(fb(dst, dm))
        t0 = time.perf_counter()
        np.asarray(fb(dst, dm))
        bt = time.perf_counter() - t0

        print(f"r={r:4.2f} cap={cap:2d} T=2^{tbl}: query {dt*1e3:7.3f} ms  "
              f"build {bt*1e3:6.1f} ms  overflow={float(grid.overflow_frac):.4f} "
              f"notfound={notfound:.4f} idx-agree={ok:.4f}")


if __name__ == "__main__":
    main()
