#!/usr/bin/env python
"""In-process A/B of the COLD NN sweep strategies (iteration-1, +inf seeds).

Strategy A (ICP_NN_COLD_SEED default): decimated-subset seed pre-pass +
survivor-list kernel.  Strategy B: the round-2 zig-zag carry-pruned kernel.
Process-level A/B of bench.py runs is worthless here — identical code has
measured 95 vs 148 f/s across processes (remote-tunnel contention), so this
harness toggles nn_pallas._COLD_SEED in ONE process and chain-times both
paths interleaved (A B A B), folding jnp.sum(dist) into the carry (the DCE
trap: folding one element lets XLA slice the sweep away).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.ops import nn_pallas as m
from icp_rust_tpu.ops.nn import morton_order
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 20


def make_chain(flag: str, *compile_args):
    """The flag is read at TRACE time, so compile eagerly while it holds
    (the returned executable is then independent of later toggles)."""
    m._COLD_SEED = flag
    m._nn_seeded_2d.clear_cache()

    @jax.jit
    def run(q, db, dm):
        qb = jnp.full(q.shape[:-1], jnp.inf, q.dtype)

        def body(i, carry):
            q_shift, acc = carry
            res, _ = m.nn_pallas_matched(
                q_shift, db, dm, q_tile=256, db_tile=2048, q_bound=qb
            )
            return (q_shift + 1e-12 * acc, acc + jnp.sum(res.dist_sq))

        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
        return acc

    np.asarray(run(*compile_args))  # trace+compile under the flag
    return run


def timed(name, fn, *args):
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best / CHAIN * 1e3:9.3f} ms/sweep")
    return best / CHAIN


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm, dm = jnp.asarray(mask[0]), jnp.asarray(mask[1])
    so = np.asarray(morton_order(src, sm))
    do = np.asarray(morton_order(dst, dm))
    q = src[so]
    db, dmm = dst[do], dm[do]

    run_a = make_chain("1", q, db, dmm)   # decimated seed
    run_b = make_chain("0", q, db, dmm)  # zig-zag
    # parity first
    a = np.asarray(run_a(q, db, dmm))
    b = np.asarray(run_b(q, db, dmm))
    assert a == b, (a, b)
    for rep in range(3):
        timed(f"cold=decimated-seed rep{rep}", run_a, q, db, dmm)
        timed(f"cold=zig-zag        rep{rep}", run_b, q, db, dmm)


if __name__ == "__main__":
    main()
