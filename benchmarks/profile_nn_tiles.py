#!/usr/bin/env python
"""Sweep Pallas NN kernel tile sizes against the XLA tiled scan."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 10


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / CHAIN
    print(f"{name:40s} {dt*1e3:9.3f} ms/op")


def chain(fn):
    def run(q, d, m):
        def body(i, carry):
            q_shift, acc = carry
            res = fn(q_shift, d, m)
            return (q_shift + 1e-12 * acc, acc + res.dist_sq[0])
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
        return acc
    return jax.jit(run)


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    dm = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    for tile in (1024, 2048, 4096):
        timed(f"nn_xla direct tile={tile}",
              chain(lambda q, d, m, t=tile: nn_xla(q, d, m, tile=t)),
              src, dst, dm)
    for qt, dt_ in ((256, 512), (256, 2048), (512, 1024), (1024, 2048),
                    (128, 4096), (512, 4096)):
        try:
            timed(f"nn_pallas q={qt} db={dt_}",
                  chain(lambda q, d, m, a=qt, b=dt_: nn_pallas(
                      q, d, m, q_tile=a, db_tile=b)),
                  src, dst, dm)
        except Exception as e:
            print(f"nn_pallas q={qt} db={dt_} FAILED: {type(e).__name__}")


if __name__ == "__main__":
    main()
