#!/usr/bin/env python
"""Clean (differenced) decomposition of one odometry frame."""

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
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nearest_neighbor
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800


def measure(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def diff(name, build, k1, k2, *args):
    t1 = measure(jax.jit(build(k1)), *args)
    t2 = measure(jax.jit(build(k2)), *args)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:48s} {per*1e3:9.3f} ms/iter (t{k1}={t1*1e3:.0f} "
          f"t{k2}={t2*1e3:.0f})")


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:4]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    cfg_p = cfg.with_(align_backend="pallas")
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm = jnp.asarray(mask[0])
    dm = jnp.asarray(mask[1])
    t_id = RigidTransform2.identity(dtype=jnp.float32)
    print(f"platform={jax.devices()[0].platform}")

    # full frame chained (same pair each time, warm start identity)
    def frame(k, config):
        def run(s, d, s_m, d_m):
            def body(i, carry):
                t, acc = carry
                tt = icp3d_planar(s, d, s_m, d_m,
                                  RigidTransform2.identity(
                                      dtype=jnp.float32), config)
                return (tt, acc + tt.t[0])
            _, acc = jax.lax.fori_loop(
                0, k, body, (t_id, jnp.float32(0)))
            return acc
        return run

    diff("icp3d_planar frame [xla align]",
         lambda k: frame(k, cfg), 1, 4, src, dst, sm, dm)
    diff("icp3d_planar frame [pallas align]",
         lambda k: frame(k, cfg_p), 1, 4, src, dst, sm, dm)

    # single outer iteration (NN + estimate_transform)
    match = nearest_neighbor(src, dst, dm)
    matched = jnp.take_along_axis(dst, match.index[..., None], axis=-2)
    mxy = matched[:, :2]
    sxy = src[:, :2]

    def inner(k, config):
        def run(s, d, m):
            def body(i, carry):
                acc = carry
                t = align2d.estimate_transform(
                    s + acc * 1e-20, d, m, config)
                return acc + t.t[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    diff("estimate_transform [xla]",
         lambda k: inner(k, cfg), 2, 12, sxy, mxy, sm)
    diff("estimate_transform [pallas]",
         lambda k: inner(k, cfg_p), 2, 12, sxy, mxy, sm)

    def gn(k, backend):
        def run(s, d, m):
            def body(i, carry):
                acc = carry
                if backend == "pallas":
                    upd = align2d.weighted_gn_update_pallas(
                        t_id, s + acc * 1e-20, d, m, 1.345, 1e-9)
                else:
                    upd = align2d.weighted_gauss_newton_update(
                        t_id, s + acc * 1e-20, d, m, 1.345, 1e-9)
                return acc + upd.delta[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    diff("weighted_gn [xla]", lambda k: gn(k, "xla"), 2, 22, sxy, mxy, sm)
    diff("weighted_gn [pallas]", lambda k: gn(k, "pallas"), 2, 22,
         sxy, mxy, sm)

    # NN alone for reference
    def nn(k):
        def run(q, d, m):
            def body(i, carry):
                qq, acc = carry
                r = nearest_neighbor(qq, d, m)
                return (qq + 1e-12 * acc, acc + r.dist_sq[0])
            _, acc = jax.lax.fori_loop(0, k, body, (q, jnp.float32(0)))
            return acc
        return run

    diff("nearest_neighbor 28800^2 D=3", nn, 2, 12, src, dst, dm)


if __name__ == "__main__":
    main()
