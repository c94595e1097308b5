#!/usr/bin/env python
"""Micro-profiles with dispatch overhead amortized: each timed program
chains REPS iterations of the op inside ONE jitted computation, so the
remote-dispatch roundtrip is paid once."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 20


def timed(name, fn, *args, chain=CHAIN):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = time.perf_counter() - t0
    print(f"{name:44s} {dt*1e3/chain:9.3f} ms/op  ({dt*1e3:8.1f} ms total)")


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    if not os.path.exists(path):
        scan_io.synthesize_scans3d(path, n_frames=4, seed=0)
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)

    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm = jnp.asarray(mask[0])
    dm = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform} n={PAD_TO} chain={CHAIN}")

    # Pure dispatch+fetch roundtrip.
    f = jax.jit(lambda x: x + 1.0)
    timed("dispatch+fetch roundtrip", f, jnp.zeros(()), chain=1)

    # NN chained: feed argmin result back in so iterations serialize.
    from icp_rust_tpu.ops.nn_pallas import nn_pallas

    def nn_chain(q, d, m):
        def body(i, carry):
            q_shift, acc = carry
            res = nn_pallas(q_shift, d, m)
            return (q_shift + 1e-12 * acc, acc + res.dist_sq[0])
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
        return acc

    timed("nn_pallas (chained)", jax.jit(nn_chain), src, dst, dm)

    from icp_rust_tpu.ops.nn import nn_xla

    def nn_chain_xla(q, d, m):
        def body(i, carry):
            q_shift, acc = carry
            res = nn_xla(q_shift, d, m, tile=2048)
            return (q_shift + 1e-12 * acc, acc + res.dist_sq[0])
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
        return acc

    timed("nn_xla direct (chained)", jax.jit(nn_chain_xla), src, dst, dm)

    # sort chained
    def sort_chain(x):
        def body(i, c):
            return jnp.sort(c) * (1.0 + 1e-9)
        return jax.lax.fori_loop(0, CHAIN, body, x)

    timed("jnp.sort 28800 (chained)", jax.jit(sort_chain), src[:, 0])

    # one weighted GN update chained
    t_id = RigidTransform2.identity(dtype=jnp.float32)

    def gn_chain(s, d, m):
        def body(i, carry):
            acc = carry
            upd = align2d.weighted_gauss_newton_update(
                RigidTransform2.identity(dtype=jnp.float32), s + acc * 1e-12,
                d, m, cfg.huber_k, cfg.det_rel_eps)
            return acc + upd.delta[0]
        return jax.lax.fori_loop(0, CHAIN, body, jnp.float32(0))

    timed("weighted_gn_update (chained)", jax.jit(gn_chain),
          src[:, :2], dst[:, :2], sm)

    # inner-loop iteration census on real consecutive-frame data: run
    # estimate_transform manually and count.
    def count_iters(s, d, m):
        huber_k = cfg.huber_k
        t0 = RigidTransform2.identity(dtype=jnp.float32)

        def cond(c):
            t, prev, done, it = c
            return (it < cfg.inner_max_iter) & ~done

        def body(c):
            t, prev, done, it = c
            upd = align2d.weighted_gauss_newton_update(
                t, s, d, m, huber_k, cfg.det_rel_eps)
            d2 = jnp.sum(upd.delta ** 2)
            e = align2d.huber_error(t, s, d, m, huber_k)
            stop = (~upd.ok) | (d2 < cfg.inner_delta_sq_tol) | (e > prev)
            t2 = RigidTransform2.from_twist(upd.delta).compose(t)
            tn = RigidTransform2(
                jnp.where(stop, t.rot, t2.rot), jnp.where(stop, t.t, t2.t))
            return (tn, jnp.where(stop, prev, e), stop, it + 1)

        _, _, _, iters = jax.lax.while_loop(
            cond, body, (t0, jnp.float32(np.finfo(np.float32).max),
                         jnp.bool_(False), 0))
        return iters

    # after a 1-NN match (the real inner-loop input)
    from icp_rust_tpu.ops.nn import nearest_neighbor
    match = nearest_neighbor(src, dst, dm)
    matched = jnp.take_along_axis(dst, match.index[..., None], axis=-2)
    n_it = jax.jit(count_iters)(src[:, :2], matched[:, :2], sm)
    print(f"inner-loop iterations (frame0->1, outer iter 1): {int(n_it)}")


if __name__ == "__main__":
    main()
