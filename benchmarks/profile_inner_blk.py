#!/usr/bin/env python
"""_PAIR_BLK sweep for the desynchronized batched IRLS kernel.

Round-3 budget: the batched solve's inner loop totals ~23 ms of the
60 ms call = 4 blocks x lockstep-max IRLS iterations x ~14 us.  Bigger
blocks amortize the ~5 us fixed per-iteration cost but pay the
max-of-more-pairs lockstep; this measures the real tradeoff on the
209x768 scans/2d workload with first-outer correspondences (worst
case) and with late-outer correspondences (steady state).

Run on the real TPU: `python benchmarks/profile_inner_blk.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.models.icp2d import _spatial_sort, icp2d
from icp_rust_tpu.ops import align2d, align2d_pallas
from icp_rust_tpu.ops.nn import nearest_neighbor_matched
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
    src_s, sm_s, _ = _spatial_sort(src, sm)
    dst_s, dm_s, _ = _spatial_sort(dst, dm)
    print(f"platform={jax.devices()[0].platform} B={b} N={n}")

    # worst-case correspondences: first outer iteration at identity
    _, matched0 = nearest_neighbor_matched(
        src_s, dst_s, dm_s, backend=cfg.nn_backend, tile=cfg.nn_dst_tile,
        method=cfg.nn_method, q_tile=cfg.nn_query_tile)
    # steady-state correspondences: matches at the converged transform
    t_fin = icp2d(src * cfg.point_scale, dst * cfg.point_scale, sm, dm,
                  __import__("icp_rust_tpu.geometry.transform2d",
                             fromlist=["RigidTransform2"]
                             ).RigidTransform2.identity((b,), jnp.float32),
                  config=cfg)
    src_fin = t_fin.apply_points(src * cfg.point_scale) / cfg.point_scale
    src_fin_s, _, _ = _spatial_sort(src_fin, sm)
    _, matched_fin = nearest_neighbor_matched(
        src_fin_s, dst_s, dm_s, backend=cfg.nn_backend,
        tile=cfg.nn_dst_tile, method=cfg.nn_method,
        q_tile=cfg.nn_query_tile)
    matched0 = jax.block_until_ready(matched0)
    matched_fin = jax.block_until_ready(matched_fin)

    def inner_chain(k, matched):
        def f(src0):
            def body(s_pts, _):
                dt = align2d.estimate_transform(s_pts, matched, sm_s, cfg)
                return s_pts + 1e-7 * dt.t[:, None, :], jnp.sum(dt.t)
            s_pts, out = jax.lax.scan(body, src0, None, length=k)
            return jnp.sum(s_pts) + jnp.sum(out)
        return f

    for blk in (32, 64, 128, 256):
        align2d_pallas._PAIR_BLK = blk
        for tag, matched in (("cold", matched0), ("warm", matched_fin)):
            t1 = measure(jax.jit(inner_chain(2, matched)), src_s)
            t2 = measure(jax.jit(inner_chain(10, matched)), src_s)
            per = (t2 - t1) / 8
            print(f"blk={blk:4d} {tag}   {per*1e3:9.3f} ms/outer "
                  f"(t2={t1*1e3:.0f} t10={t2*1e3:.0f})")
    align2d_pallas._PAIR_BLK = 64


if __name__ == "__main__":
    main()
