#!/usr/bin/env python
"""Calibration v2: difference two chain lengths to cancel the constant
dispatch+fetch roundtrip (~27 ms on this tunnel)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def measure(build, k):
    fn = jax.jit(build(k))
    fn_args = ()
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def diff_timed(name, build, k1, k2):
    t1 = measure(build, k1)
    t2 = measure(build, k2)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:46s} {per*1e3:9.4f} ms/unit   (t{k1}={t1*1e3:.1f} "
          f"t{k2}={t2*1e3:.1f})")
    return per


def main():
    print(f"platform={jax.devices()[0].platform}")

    # matmul peak
    a = jnp.ones((4096, 4096), jnp.float32)

    def mm(k):
        def run():
            def body(i, v):
                return (v @ a) * 1e-9
            return jax.lax.fori_loop(0, k, body, a)[0, 0]
        return run

    per = diff_timed("matmul 4096^3 f32", mm, 2, 6)
    print(f"  -> {2*4096**3/per/1e12:.1f} TFLOP/s f32")

    ab = jnp.ones((4096, 4096), jnp.bfloat16)

    def mmb(k):
        def run():
            def body(i, v):
                return (v @ ab) * jnp.bfloat16(1e-9)
            return jax.lax.fori_loop(0, k, body, ab)[0, 0]
        return run

    per = diff_timed("matmul 4096^3 bf16", mmb, 2, 6)
    print(f"  -> {2*4096**3/per/1e12:.1f} TFLOP/s bf16")

    # bandwidth
    x = jnp.ones((32 * 1024 * 1024,), jnp.float32)  # 128MB

    def triad(k):
        def run():
            def body(i, v):
                return v * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, k, body, x)[0]
        return run

    per = diff_timed("triad 128MB rw", triad, 2, 10)
    print(f"  -> {2*x.nbytes/per/1e9:.0f} GB/s effective (r+w)")

    # per-op overhead: tiny dependent ops
    def tiny(k):
        def run():
            def body(i, v):
                return v * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, k, body, jnp.float32(1.0))
        return run

    diff_timed("dependent scalar op", tiny, 100, 1100)

    arr = jnp.ones((225, 128), jnp.float32)

    def vpu(k):
        def run():
            def body(i, v):
                return v * 1.0000001 + 1e-9
            return jax.lax.fori_loop(0, k, body, arr)[0, 0]
        return run

    diff_timed("dependent (225,128) op", vpu, 100, 1100)

    def red(k):
        def run():
            def body(i, carry):
                v, acc = carry
                return (v, acc + jnp.sum(v * (1.0 + acc * 1e-20)))
            _, acc = jax.lax.fori_loop(0, k, body, (arr, jnp.float32(0)))
            return acc
        return run

    diff_timed("dependent (225,128) sum", red, 100, 600)

    # pallas call overhead
    def ek(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0] + 1.0

    call = pl.pallas_call(
        ek,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )

    def pallas(k):
        def run():
            def body(i, v):
                return call(v)
            return jax.lax.fori_loop(0, k, body,
                                     jnp.ones((1, 1), jnp.float32))
        return run

    diff_timed("empty pallas call", pallas, 20, 220)

    # NN kernel with differencing, for a clean number
    from icp_rust_tpu.ops.nn import nn_xla
    from icp_rust_tpu.ops.nn_pallas import nn_pallas
    from icp_rust_tpu.utils import io as scan_io

    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=28800)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    dm = jnp.asarray(mask[1])

    def nnx(k):
        def run():
            def body(i, carry):
                q, acc = carry
                r = nn_xla(q, dst, dm, tile=2048)
                return (q + 1e-12 * acc, acc + r.dist_sq[0])
            _, acc = jax.lax.fori_loop(0, k, body, (src, jnp.float32(0)))
            return acc
        return run

    diff_timed("nn_xla 28800^2", nnx, 2, 12)

    def nnp(k):
        def run():
            def body(i, carry):
                q, acc = carry
                r = nn_pallas(q, dst, dm, q_tile=256, db_tile=2048)
                return (q + 1e-12 * acc, acc + r.dist_sq[0])
            _, acc = jax.lax.fori_loop(0, k, body, (src, jnp.float32(0)))
            return acc
        return run

    diff_timed("nn_pallas v3 28800^2", nnp, 2, 12)


if __name__ == "__main__":
    main()
