#!/usr/bin/env python
"""Grid-shape sweep for the pair-grid batched NN kernel (VERDICT r2 #2).

The round-3 budget (profile_batch.py) shows the batched NN at
~1.75 ms/outer where its compute floor is ~0.2 ms: per-grid-step
overhead dominates at 627 steps (209 pairs x 3 query subtiles).
This sweeps q_sub (steps = B * Nq/q_sub) with chain-differenced
timing to isolate the per-step cost.

Run on the real TPU: `python benchmarks/profile_nn_pairs.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.models.icp2d import _spatial_sort
from icp_rust_tpu.ops.nn_pallas import nn_pallas_matched_pairs
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
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0)
    src = jnp.asarray(pts[:-1], jnp.float32) / cfg.point_scale
    dst = jnp.asarray(pts[1:], jnp.float32) / cfg.point_scale
    sm = jnp.asarray(mask[:-1])
    dm = jnp.asarray(mask[1:])
    b, n = src.shape[0], src.shape[1]
    src_s, sm_s, _ = _spatial_sort(src, sm)
    dst_s, dm_s, _ = _spatial_sort(dst, dm)
    print(f"platform={jax.devices()[0].platform} B={b} N={n}")

    for q_sub, q_grp in ((256, 256), (768, 256), (768, 128)):
        for seeded in (False, True, "floor"):
            def chain(k, q_sub=q_sub, q_grp=q_grp, seeded=seeded):
                def f(q0):
                    def body(q, _):
                        if seeded == "floor":
                            qb = jnp.full_like(sm_s, -jnp.inf,
                                               dtype=jnp.float32)
                        elif seeded:
                            qb = jnp.where(sm_s, 4e-4, -jnp.inf)
                        else:
                            qb = None
                        res, matched = nn_pallas_matched_pairs(
                            q, dst_s, dm_s, q_bound=qb, q_sub=q_sub,
                            q_grp=q_grp)
                        return q + 1e-7 * matched, jnp.sum(res.dist_sq)
                    q, s = jax.lax.scan(body, q0, None, length=k)
                    return jnp.sum(q) + jnp.sum(s)
                return f
            tag = {False: "unseeded", True: "seeded",
                   "floor": "all-pruned floor"}[seeded]
            diff(f"pair-grid NN q_sub={q_sub} grp={q_grp} {tag} "
                 f"(steps={b * (n // q_sub if n % q_sub == 0 else n // q_sub + 1)})",
                 chain, 2, 10, src_s)


if __name__ == "__main__":
    main()
