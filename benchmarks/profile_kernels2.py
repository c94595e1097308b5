#!/usr/bin/env python
"""Second-round kernel micro-profiles: new Pallas NN, radix digit width."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas
from icp_rust_tpu.ops.select import kth_smallest_masked
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
    print(f"{name:46s} {dt*1e3:9.3f} ms/op")


def chain_nn(fn):
    def run(q, d, m):
        def body(i, carry):
            qq, acc = carry
            res = fn(qq, d, m)
            return (qq + 1e-12 * acc, acc + res.dist_sq[0])
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
    sm = jnp.asarray(mask[0])
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    timed("nn_xla direct tile=2048",
          chain_nn(lambda q, d, m: nn_xla(q, d, m, tile=2048)), src, dst, dm)
    for qt, dtile in ((256, 2048), (512, 2048), (128, 4096), (256, 4096)):
        timed(f"nn_pallas v2 q={qt} db={dtile}",
              chain_nn(lambda q, d, m, a=qt, b=dtile: nn_pallas(
                  q, d, m, q_tile=a, db_tile=b)), src, dst, dm)

    # correctness spot-check of the v2 kernel on real TPU
    got = nn_pallas(src, dst, dm, q_tile=256, db_tile=2048)
    want = nn_xla(src, dst, dm)
    agree = (np.asarray(got.index) == np.asarray(want.index)).mean()
    print(f"pallas v2 vs xla index agreement: {agree:.6f}")

    # median via radix: digit width 4 vs 8 (chained on changing data)
    r2 = (src[:, :2] - dst[:, :2])

    def med_chain(bits):
        def run(x, m):
            def body(i, carry):
                xx, acc = carry
                n = jnp.sum(m, axis=-1).astype(jnp.int32)
                ks = jnp.stack([jnp.maximum(n // 2 - 1, 0), n // 2])
                vs = kth_smallest_masked(
                    jnp.broadcast_to(xx, (2, *xx.shape)),
                    jnp.broadcast_to(m, (2, *m.shape)), ks,
                    digit_bits=bits)
                v = 0.5 * (vs[0] + vs[1])
                return (xx + 1e-12 * v.sum(), acc + v.sum())
            _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0)))
            return acc
        return jax.jit(run)

    xs = jnp.swapaxes(r2, 0, 1)  # (2, N)
    msk2 = jnp.broadcast_to(sm, (2, sm.shape[0]))
    for bits in (4, 8):
        timed(f"masked median radix digit_bits={bits}",
              med_chain(bits), xs, msk2)

    def sort_med(x, m):
        def body(i, carry):
            xx, acc = carry
            filled = jnp.where(m, xx, jnp.inf)
            s = jnp.sort(filled, axis=-1)
            n = jnp.sum(m, axis=-1).astype(jnp.int32)
            v = jnp.take_along_axis(s, (n // 2)[..., None], axis=-1)[..., 0]
            return (xx + 1e-12 * v.sum(), acc + v.sum())
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (x, jnp.float32(0)))
        return acc

    timed("masked median via sort", jax.jit(sort_med), xs, msk2)


if __name__ == "__main__":
    main()
