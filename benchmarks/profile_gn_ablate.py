#!/usr/bin/env python
"""Ablate the fused GN kernel: full vs no-median vs empty, plus launch
overhead of a trivial pallas kernel, all chained on-device."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_rust_tpu.ops import align2d_pallas as ap
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 50
_LANES = 128


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / CHAIN
    print(f"{name:44s} {dt*1e3:9.3f} ms/op")


def make_kernel(mode):
    def k(params_ref, sx_ref, sy_ref, dx_ref, dy_ref, m_ref, out_ref):
        if mode == "empty":
            out_ref[0, 0] = params_ref[0, 0]
            for i in range(1, 16):
                out_ref[0, i] = 0.0
            return
        r00 = params_ref[0, 0]
        r01 = params_ref[0, 1]
        r10 = params_ref[0, 2]
        r11 = params_ref[0, 3]
        tx = params_ref[0, 4]
        ty = params_ref[0, 5]
        sx = sx_ref[:]
        sy = sy_ref[:]
        mask = m_ref[:] > 0.5
        n = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
        rx = r00 * sx + r01 * sy + tx - dx_ref[:]
        ry = r10 * sx + r11 * sy + ty - dy_ref[:]
        if mode == "full":
            med_x, med_y = ap._median_radix2_pair(rx, ry, mask, n)
            mad_x, mad_y = ap._median_radix2_pair(
                jnp.abs(rx - med_x), jnp.abs(ry - med_y), mask, n)
            sig_x = jnp.float32(ap._MAD_SCALE) * mad_x
            sig_y = jnp.float32(ap._MAD_SCALE) * mad_y
        elif mode == "onemed":
            med_x, med_y = ap._median_radix2_pair(rx, ry, mask, n)
            sig_x, sig_y = med_x + 1.0, med_y + 1.0
        else:  # nomed
            sig_x = jnp.float32(1.0)
            sig_y = jnp.float32(1.0)
        k2 = jnp.float32(1.345 * 1.345)
        hk = jnp.float32(1.345)
        mf = jnp.where(mask, 1.0, 0.0)
        ex = rx * rx
        ey = ry * ry
        u_x = jnp.where(ex <= k2, 1.0, hk * jax.lax.rsqrt(ex)) / sig_x * mf
        u_y = jnp.where(ey <= k2, 1.0, hk * jax.lax.rsqrt(ey)) / sig_y * mf
        w_x = -r00 * sy + r01 * sx
        w_y = -r10 * sy + r11 * sx
        out_ref[0, 0] = jnp.sum(u_x)
        out_ref[0, 1] = jnp.sum(u_x * w_x)
        out_ref[0, 2] = jnp.sum(u_x * w_x * w_x)
        out_ref[0, 3] = jnp.sum(u_x * rx)
        out_ref[0, 4] = jnp.sum(u_x * w_x * rx)
        out_ref[0, 5] = jnp.sum(u_y)
        out_ref[0, 6] = jnp.sum(u_y * w_y)
        out_ref[0, 7] = jnp.sum(u_y * w_y * w_y)
        out_ref[0, 8] = jnp.sum(u_y * ry)
        out_ref[0, 9] = jnp.sum(u_y * w_y * ry)
        e = ex + ey
        out_ref[0, 10] = jnp.sum(
            jnp.where(e <= k2, e, 2.0 * hk * jnp.sqrt(e) - k2) * mf)
        out_ref[0, 11] = n.astype(jnp.float32)
        out_ref[0, 12] = sig_x
        out_ref[0, 13] = sig_y
        out_ref[0, 14] = 0.0
        out_ref[0, 15] = 0.0
    return k


def run_mode(mode, sx, sy, dx, dy, mf):
    kern = make_kernel(mode)
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
    )

    def chain(params, sx, sy, dx, dy, mf):
        def body(i, carry):
            p, acc = carry
            out = call(p, sx, sy, dx, dy, mf)
            p2 = p.at[0, 4].add(out[0, 0] * 1e-20)
            return (p2, acc + out[0, 0])
        _, acc = jax.lax.fori_loop(
            0, CHAIN, body,
            (params, jnp.float32(0)))
        return acc

    params = jnp.zeros((1, 8), jnp.float32).at[0, 0].set(1.0).at[0, 3].set(
        1.0)
    timed(f"fused GN kernel [{mode}]", jax.jit(chain), params, sx, sy, dx,
          dy, mf)


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    shape = (PAD_TO // _LANES, _LANES)
    sx = jnp.asarray(pts[0][:, 0].reshape(shape), jnp.float32)
    sy = jnp.asarray(pts[0][:, 1].reshape(shape), jnp.float32)
    dx = jnp.asarray(pts[1][:, 0].reshape(shape), jnp.float32)
    dy = jnp.asarray(pts[1][:, 1].reshape(shape), jnp.float32)
    mf = jnp.asarray(mask[0].reshape(shape).astype(np.float32))
    print(f"platform={jax.devices()[0].platform}")
    for mode in ("empty", "nomed", "onemed", "full"):
        run_mode(mode, sx, sy, dx, dy, mf)


if __name__ == "__main__":
    main()
