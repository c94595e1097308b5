#!/usr/bin/env python
"""Per-phase budget of the BATCHED multi-pair solve (VERDICT r2 #2).

Chain-differenced (tunnel adds ~27 ms per host-timed call; see
docs/DESIGN.md methodology): each phase is timed as the difference
quotient of two chain lengths of the same jitted scan, so dispatch
overhead and DCE cancel out.

Phases per OUTER iteration on the 209-pair x 768-pt scans/2d workload:
  A. glue:      apply_points + seeded-bound pipeline + compose (no NN/GN)
  B. NN:        batched nearest_neighbor_matched (pair-grid kernel),
                seeded and unseeded
  C. inner:     estimate_transform (desynchronized whole-loop kernel)
  full:         batched_icp2d end to end

Run on the real TPU: `python benchmarks/profile_batch.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import _spatial_sort
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nearest_neighbor_matched
from icp_rust_tpu.parallel.sharded import batched_icp2d
from icp_rust_tpu.utils import io as scan_io

SCANS = os.environ.get("SCANS2D", "/root/reference/scans/2d")


def measure(fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def diff(name, build, k1, k2, *args):
    t1 = measure(jax.jit(build(k1)), *args)
    t2 = measure(jax.jit(build(k2)), *args)
    per = (t2 - t1) / (k2 - k1)
    print(f"{name:52s} {per*1e3:9.3f} ms/iter (t{k1}={t1*1e3:.0f} "
          f"t{k2}={t2*1e3:.0f})")
    return per


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=210)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0,
                    det_rel_eps=1e-9)
    src = jnp.asarray(pts[:-1], jnp.float32) / cfg.point_scale
    dst = jnp.asarray(pts[1:], jnp.float32) / cfg.point_scale
    sm = jnp.asarray(mask[:-1])
    dm = jnp.asarray(mask[1:])
    b, n = src.shape[0], src.shape[1]
    print(f"platform={jax.devices()[0].platform} B={b} N={n}")

    # production path sorts once per call
    src_s, sm_s, _ = _spatial_sort(src, sm)
    dst_s, dm_s, _ = _spatial_sort(dst, dm)
    t_id = RigidTransform2.identity((b,), jnp.float32)

    # ---- full batched call (for reference; uses the unscaled API)
    full_cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0,
                         det_rel_eps=1e-9)
    src_r = jnp.asarray(pts[:-1], jnp.float32)
    dst_r = jnp.asarray(pts[1:], jnp.float32)

    def full(src_r=src_r, dst_r=dst_r):
        out = batched_icp2d(src_r, dst_r, sm, dm, t_id, config=full_cfg)
        return out.t
    t_full = measure(jax.jit(full))
    print(f"{'full batched_icp2d (20 outers w/ fixed-pt)':52s} "
          f"{t_full*1e3:9.3f} ms  -> {b/t_full:.0f} pairs/s")

    # ---- B: NN chain, seeded (finite bound) and unseeded (inf)
    def nn_chain(k, seeded):
        def f(q0):
            def body(q, _):
                if seeded:
                    qb = jnp.full((b, n), 4e-4, jnp.float32)
                    qb = jnp.where(sm_s, qb, -jnp.inf)
                else:
                    qb = None
                res, matched = nearest_neighbor_matched(
                    q, dst_s, dm_s, backend=cfg.nn_backend,
                    tile=cfg.nn_dst_tile, method=cfg.nn_method,
                    q_tile=cfg.nn_query_tile, q_bound=qb,
                )
                return q + 1e-7 * matched, jnp.sum(res.dist_sq)
            q, s = jax.lax.scan(body, q0, None, length=k)
            return jnp.sum(q) + jnp.sum(s)
        return f
    diff("NN unseeded (pair-grid, no prune)",
         lambda k: nn_chain(k, False), 2, 10, src_s)
    diff("NN seeded (pair-grid, tight bound)",
         lambda k: nn_chain(k, True), 2, 10, src_s)

    # ---- C: inner loop (use real first-iteration correspondences)
    res0, matched0 = nearest_neighbor_matched(
        src_s, dst_s, dm_s, backend=cfg.nn_backend, tile=cfg.nn_dst_tile,
        method=cfg.nn_method, q_tile=cfg.nn_query_tile)
    matched0 = jax.block_until_ready(matched0)

    def inner_chain(k):
        def f(src0):
            def body(s_pts, _):
                dt = align2d.estimate_transform(s_pts, matched0, sm_s, cfg)
                return s_pts + 1e-7 * dt.t[:, None, :], jnp.sum(dt.t)
            s_pts, out = jax.lax.scan(body, src0, None, length=k)
            return jnp.sum(s_pts) + jnp.sum(out)
        return f
    diff("inner loop (desync whole-loop kernel)", inner_chain, 2, 10,
         src_s)

    # ---- A: glue (everything the outer body does around NN+inner)
    def glue_chain(k):
        def f(t0_t):
            t = RigidTransform2(
                jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (b, 2, 2)),
                t0_t)
            aux = (jnp.full((b, n), jnp.inf, jnp.float32), src_s)

            def body(carry, _):
                t, aux = carry
                prev_d2, prev_q = aux
                src_t = t.apply_points(src_s)
                move = jnp.linalg.norm(src_t - prev_q, axis=-1)
                ulp = 1.0 + 32.0 * jnp.finfo(jnp.float32).eps
                qb = (jnp.sqrt(prev_d2) + move) ** 2 * ulp
                dt = RigidTransform2(
                    jnp.broadcast_to(
                        jnp.eye(2, dtype=jnp.float32), (b, 2, 2)),
                    1e-8 * src_t[:, 0, :] + 1e-12 * qb[:, :1])
                return (dt.compose(t), (prev_d2 * 0.999, src_t)), None
            (t, aux), _ = jax.lax.scan(body, (t, aux), None, length=k)
            return jnp.sum(t.t) + jnp.sum(aux[0])
        return f
    diff("glue (apply+bound+compose)", glue_chain, 2, 20, t_id.t)


if __name__ == "__main__":
    main()
