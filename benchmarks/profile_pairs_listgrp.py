#!/usr/bin/env python
"""Sweep the survivor-list pairs kernel's list group size (device).

Chain-differenced seeded NN sweeps at 209x768 with a realistic tight
bound; the census (profile_pairs_survivors.py) says mean survivors of
6 chunks: 5.0 @ grp=256, 3.2 @ 64, 2.6 @ 32 — this measures whether
the extra fori trips eat the saved chunk visits.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

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


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=210)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    src = jnp.asarray(pts[:-1], jnp.float32) / 3000.0
    dst = jnp.asarray(pts[1:], jnp.float32) / 3000.0
    sm = jnp.asarray(mask[:-1])
    dm = jnp.asarray(mask[1:])
    src, sm, _ = _spatial_sort(src, sm)
    dst, dm, _ = _spatial_sort(dst, dm)
    b, n = src.shape[0], src.shape[1]
    print(f"platform={jax.devices()[0].platform} B={b} N={n}")

    def chain(k, grp):
        def f(q0):
            def body(q, _):
                qb = jnp.where(sm, jnp.full((b, n), 4e-4, jnp.float32),
                               -jnp.inf)
                res, matched = nn_pallas_matched_pairs(
                    q, dst, dm, q_bound=qb, list_grp=grp)
                return q + 1e-7 * matched, jnp.sum(res.dist_sq)
            q, s = jax.lax.scan(body, q0, None, length=k)
            return jnp.sum(q) + jnp.sum(s)
        return f

    base = None
    for grp in (256, 128, 64, 32):
        t1 = measure(jax.jit(chain(2, grp)), src)
        t2 = measure(jax.jit(chain(10, grp)), src)
        per = (t2 - t1) / 8
        print(f"list_grp={grp:4d}: {per*1e3:7.3f} ms/sweep "
              f"(t2={t1*1e3:.0f} t10={t2*1e3:.0f})")


if __name__ == "__main__":
    main()
