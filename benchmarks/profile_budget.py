#!/usr/bin/env python
"""Round-3 per-phase budget of the CURRENT headline frame (VERDICT r2 #1).

The round-1 "94% NN" breakdown went stale the moment the pruned kernel
landed; this harness re-derives the per-phase budget of the production
bench path (icp3d_planar: sorted inputs, pruned+payload NN with seeded
bounds, whole-inner-loop Pallas align) by chain differencing (the tunnel
adds ~27 ms per host-timed call; see docs/DESIGN.md methodology).

Phases measured per OUTER iteration on the 28,800-pt synthetic 3D frames:
  A. apply/glue: transform_xy + movement bound + compose (no NN, no GN)
  B. NN sweep:   nearest_neighbor_matched on sorted data, seeded bound
  C. inner loop: estimate_transform (whole-loop Pallas kernel)
  full frame:    icp3d_planar warm-started (fixed-point exit, ~avg outers)

Prints a table; run on the real TPU (takes ~1 min).
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
from icp_rust_tpu.models.icp2d import icp3d_planar, _spatial_sort
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nearest_neighbor_matched
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800


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
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:4]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9, align_backend="pallas")
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm = jnp.asarray(mask[0])
    dm = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform}")

    # The production path sorts once per call; profile phases on sorted
    # data (what the kernels actually see).
    src_s, sm_s, _ = _spatial_sort(src, sm)
    dst_s, dm_s, _ = _spatial_sort(dst, dm)
    payload_xy = dst_s[..., :2]
    t_id = RigidTransform2.identity(dtype=jnp.float32)

    # ---- full frame (warm-start identity; ~avg outers via fixed point)
    def frame(k):
        def run(s, d, s_m, d_m):
            def body(i, acc):
                tt = icp3d_planar(
                    s, d, s_m, d_m,
                    RigidTransform2.identity(dtype=jnp.float32), cfg)
                return acc + tt.t[0] * 1e-20 + i * 0.0
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t_frame = diff("icp3d_planar FULL frame", frame, 1, 4,
                   src, dst, sm, dm)

    # ---- B: NN sweep with payload, seeded bound (warm case: bound from
    # a converged previous iteration => tight), and cold (+inf bound).
    def nn_phase(k, seeded):
        def run(q, d, d_m, pay):
            d2_0 = jnp.full(q.shape[:-1], jnp.inf, q.dtype)
            def body(i, carry):
                qq, d2, acc = carry
                qb = (jnp.sqrt(d2) + 0.0) ** 2 * (
                    1.0 + 32 * jnp.finfo(q.dtype).eps)
                res, matched = nearest_neighbor_matched(
                    qq, d, d_m, payload=pay, backend="pallas",
                    tile=cfg.nn_dst_tile, q_tile=cfg.nn_query_tile,
                    q_bound=qb if seeded else None,
                )
                return (qq + 1e-30 * acc, res.dist_sq,
                        acc + matched[0, 0])
            _, _, acc = jax.lax.fori_loop(
                0, k, body, (q, d2_0, jnp.float32(0)))
            return acc
        return run

    t_nn_cold = diff("NN matched+pruned COLD (inf bound)",
                     lambda k: nn_phase(k, False), 2, 10,
                     src_s, dst_s, dm_s, payload_xy)
    t_nn_warm = diff("NN matched+pruned WARM (seeded bound)",
                     lambda k: nn_phase(k, True), 2, 10,
                     src_s, dst_s, dm_s, payload_xy)

    # ---- C: inner loop on a realistic matched set
    res, matched_xy = nearest_neighbor_matched(
        src_s, dst_s, dm_s, payload=payload_xy, backend="pallas",
        tile=cfg.nn_dst_tile, q_tile=cfg.nn_query_tile)
    sxy = src_s[:, :2]

    def inner(k):
        def run(s, d, m):
            def body(i, acc):
                t = align2d.estimate_transform(s + acc * 1e-30, d, m, cfg)
                return acc + t.t[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    t_inner = diff("estimate_transform whole-loop [pallas]",
                   inner, 2, 10, sxy, matched_xy, sm_s)

    # ---- A: glue = one outer iteration minus NN minus inner
    def outer_once(k):
        def run(s, d, s_m, d_m, pay):
            def body(i, carry):
                t, d2, prev_xy, acc = carry
                src_t3 = jnp.concatenate(
                    [t.apply_points(s[..., :2]), s[..., 2:]], axis=-1)
                move = jnp.linalg.norm(src_t3[..., :2] - prev_xy, axis=-1)
                qb = (jnp.sqrt(d2) + move) ** 2 * (
                    1.0 + 32 * jnp.finfo(s.dtype).eps)
                res, mxy = nearest_neighbor_matched(
                    src_t3, d, d_m, payload=pay, backend="pallas",
                    tile=cfg.nn_dst_tile, q_tile=cfg.nn_query_tile,
                    q_bound=qb)
                dt = align2d.estimate_transform(
                    src_t3[..., :2], mxy, s_m, cfg)
                return (dt.compose(t), res.dist_sq, src_t3[..., :2],
                        acc + dt.t[0])
            d2_0 = jnp.full(s.shape[:-1], jnp.inf, s.dtype)
            _, _, _, acc = jax.lax.fori_loop(
                0, k, body, (RigidTransform2.identity(dtype=jnp.float32),
                             d2_0, s[..., :2], jnp.float32(0)))
            return acc
        return run

    t_outer = diff("ONE outer iteration (NN+inner+glue)", outer_once,
                   2, 10, src_s, dst_s, sm_s, dm_s, payload_xy)

    print()
    glue = t_outer - t_nn_warm - t_inner
    print(f"budget/outer: NN(warm) {t_nn_warm*1e3:.3f}  inner "
          f"{t_inner*1e3:.3f}  glue {glue*1e3:.3f}  "
          f"total {t_outer*1e3:.3f} ms")
    print(f"frame at ~9.6 outers predicted {t_outer*9.6*1e3:.1f} ms; "
          f"measured full frame (identity start, ~20 outers) "
          f"{t_frame*1e3:.1f} ms")


if __name__ == "__main__":
    main()
