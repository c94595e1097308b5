#!/usr/bin/env python
"""Calibrate this TPU's per-op / per-launch overheads and peak compute."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(name, fn, *args, n=1):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.4f} ms/unit")
    return dt


def main():
    print(f"platform={jax.devices()[0].platform}")

    # Peak-ish matmul: 4096^3 f32 and bf16.
    a = jnp.ones((4096, 4096), jnp.float32)
    b = jnp.ones((4096, 4096), jnp.float32)
    f = jax.jit(lambda a, b: (a @ b)[0, 0])
    dt = timed("matmul 4096^3 f32", f, a, b)
    print(f"  -> {2*4096**3/dt/1e12:.1f} TFLOP/s f32")
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)
    f = jax.jit(lambda a, b: (a @ b)[0, 0])
    dt = timed("matmul 4096^3 bf16", f, ab, bb)
    print(f"  -> {2*4096**3/dt/1e12:.1f} TFLOP/s bf16")

    # Elementwise bandwidth: 64M f32 triad.
    x = jnp.ones((64 * 1024 * 1024,), jnp.float32)
    f = jax.jit(lambda x: (x * 1.5 + 2.0).sum())
    dt = timed("triad 256MB read", f, x)
    print(f"  -> {x.nbytes/dt/1e9:.0f} GB/s")

    # Per-XLA-op overhead: fori_loop of K dependent tiny ops.
    K = 200
    def tiny_chain(x):
        def body(i, v):
            return v * 1.0000001 + 1e-9
        return jax.lax.fori_loop(0, K, body, x)
    dt = timed(f"chain of {K} dependent scalar ops", jax.jit(tiny_chain),
               jnp.float32(1.0), n=K)

    # Same but on a (225,128) array (VPU op size).
    arr = jnp.ones((225, 128), jnp.float32)
    def arr_chain(x):
        def body(i, v):
            return v * 1.0000001 + 1e-9
        return jax.lax.fori_loop(0, K, body, x)
    dt = timed(f"chain of {K} dependent (225,128) ops",
               jax.jit(arr_chain), arr, n=K)

    # Chain of K dependent REDUCTIONS (the radix-select shape).
    def red_chain(x):
        def body(i, carry):
            v, acc = carry
            s = jnp.sum(v * (1.0 + acc * 1e-20))
            return (v, acc + s)
        _, acc = jax.lax.fori_loop(0, K, body, (x, jnp.float32(0)))
        return acc
    dt = timed(f"chain of {K} dependent (225,128) sums",
               jax.jit(red_chain), arr, n=K)

    # Per-pallas-call overhead inside fori_loop.
    def empty_kernel(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0] + 1.0

    call = pl.pallas_call(
        empty_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
    )
    K2 = 50
    def pallas_chain(x):
        def body(i, v):
            return call(v)
        return jax.lax.fori_loop(0, K2, body, x)
    timed(f"chain of {K2} empty pallas calls", jax.jit(pallas_chain),
          jnp.ones((1, 1), jnp.float32), n=K2)

    # Grid-step overhead: one pallas call, many tiny grid steps.
    def gkernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    G = 1024
    gx = jnp.ones((G * 8, 128), jnp.float32)
    gcall = pl.pallas_call(
        gkernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
    )
    timed(f"pallas {G} tiny grid steps", jax.jit(
        lambda x: gcall(x)[0, 0]), gx, n=G)


if __name__ == "__main__":
    main()
