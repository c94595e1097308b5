#!/usr/bin/env python
"""Fused Pallas GN update vs XLA path on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 20


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / CHAIN
    print(f"{name:40s} {dt*1e3:9.3f} ms/op")


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0][:, :2], jnp.float32)
    dst = jnp.asarray(pts[1][:, :2], jnp.float32)
    sm = jnp.asarray(mask[0])
    t_id = RigidTransform2.identity(dtype=jnp.float32)
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    # correctness on-device
    ref = jax.jit(lambda t, s, d, m: align2d.weighted_gauss_newton_update(
        t, s, d, m, 1.345, 1e-9))(t_id, src, dst, sm)
    got = jax.jit(lambda t, s, d, m: align2d.weighted_gn_update_pallas(
        t, s, d, m, 1.345, 1e-9))(t_id, src, dst, sm)
    print("delta xla   :", np.asarray(ref.delta))
    print("delta pallas:", np.asarray(got.delta))
    print("err rel diff:", abs(float(ref.err) - float(got.err)) /
          max(abs(float(ref.err)), 1e-9))

    def chain(fn):
        def run(t, s, d, m):
            def body(i, carry):
                tt, acc = carry
                upd = fn(tt, s, d, m)
                t2 = RigidTransform2(tt.rot, tt.t + 1e-12 * upd.delta[:2])
                return (t2, acc + upd.err)
            _, acc = jax.lax.fori_loop(
                0, CHAIN, body, (t, jnp.float32(0)))
            return acc
        return jax.jit(run)

    timed("weighted_gn XLA (chained)",
          chain(lambda t, s, d, m: align2d.weighted_gauss_newton_update(
              t, s, d, m, 1.345, 1e-9)), t_id, src, dst, sm)
    timed("weighted_gn PALLAS fused (chained)",
          chain(lambda t, s, d, m: align2d.weighted_gn_update_pallas(
              t, s, d, m, 1.345, 1e-9)), t_id, src, dst, sm)


if __name__ == "__main__":
    main()
