#!/usr/bin/env python
"""Grid-step overhead hypothesis test: NN time vs (q_tile, db_tile).

If the pruned NN's time tracks the number of grid steps rather than the
compute volume, the per-step fixed cost dominates and the win is fewer,
bigger tiles (or moving the db loop in-kernel) — not finer pruning.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.models.icp2d import _spatial_sort
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
    print(f"{name:48s} {per*1e3:9.3f} ms/iter")
    return per


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    sm = jnp.asarray(mask[0])
    dm = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform}")
    src_s, sm_s, _ = _spatial_sort(src, sm)
    dst_s, dm_s, _ = _spatial_sort(dst, dm)
    payload_xy = dst_s[..., :2]

    def nn_phase(q_tile, db_tile, seeded=True):
        def build(k):
            def run(q, d, d_m, pay):
                d2_0 = jnp.full(q.shape[:-1], jnp.inf, q.dtype)
                def body(i, carry):
                    qq, d2, acc = carry
                    qb = d2 * (1.0 + 32 * jnp.finfo(q.dtype).eps)
                    res, matched = nearest_neighbor_matched(
                        qq, d, d_m, payload=pay, backend="pallas",
                        tile=db_tile, q_tile=q_tile,
                        q_bound=qb if seeded else None,
                    )
                    return (qq + 1e-30 * acc, res.dist_sq,
                            acc + matched[0, 0])
                _, _, acc = jax.lax.fori_loop(
                    0, k, body, (q, d2_0, jnp.float32(0)))
                return acc
            return run
        return build

    for q_tile, db_tile in [(256, 2048), (256, 4096),
                            (512, 2048), (512, 4096),
                            (1024, 4096), (256, 1024)]:
        n_steps = (-(-PAD_TO // q_tile)) * (-(-PAD_TO // db_tile))
        diff(f"NN warm q={q_tile:5d} db={db_tile:5d} steps={n_steps:5d}",
             nn_phase(q_tile, db_tile), 2, 10,
             src_s, dst_s, dm_s, payload_xy)


if __name__ == "__main__":
    main()
