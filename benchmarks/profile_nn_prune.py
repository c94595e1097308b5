#!/usr/bin/env python
"""Pruned+rotated NN kernel vs the plain sweep: hardware parity + timing.

Measures on the ICP-realistic workload (consecutive synthetic 3D frames,
so queries are warm-start-aligned with the db — the regime the diagonal
rotation + bbox pruning is designed for), plus a worst case (queries
shuffled, killing tile locality) to bound the pruning overhead.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.ops.nn import azimuth_order, nn_xla
from icp_rust_tpu.ops.nn_pallas import nn_pallas, nn_pallas_matched
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
CHAIN = 10


def timed(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / CHAIN
    print(f"{name:48s} {dt*1e3:9.3f} ms/op")
    return dt


def chain(fn):
    def run(q, d, m):
        def body(i, carry):
            q_shift, acc = carry
            res = fn(q_shift, d, m)
            return (q_shift + 1e-12 * acc, acc + res.dist_sq[0])
        _, acc = jax.lax.fori_loop(0, CHAIN, body, (q, jnp.float32(0)))
        return acc
    return jax.jit(run)


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:2]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    src = jnp.asarray(pts[0], jnp.float32)
    dst = jnp.asarray(pts[1], jnp.float32)
    dm = jnp.asarray(mask[1])
    rng = np.random.default_rng(0)
    src_shuf = jnp.asarray(pts[0][rng.permutation(PAD_TO)], jnp.float32)
    # Azimuth-sorted clouds: the layout the drivers feed the pruned kernel.
    so = np.asarray(azimuth_order(src, jnp.asarray(mask[0])))
    do = np.asarray(azimuth_order(dst, dm))
    src_az = src[so]
    dst_az, dm_az = dst[do], dm[do]
    print(f"platform={jax.devices()[0].platform} n={PAD_TO}")

    @jax.jit
    def sort_cost(p, m):
        o = azimuth_order(p, m)
        return p[o][0, 0]

    sm = jnp.asarray(mask[0])
    out = sort_cost(src, sm); np.asarray(out)
    t0 = time.perf_counter(); np.asarray(sort_cost(src, sm))
    print(f"azimuth argsort+gather 28800 (incl ~27ms tunnel): "
          f"{(time.perf_counter()-t0)*1e3:.2f} ms")

    # --- hardware parity: pruned kernel vs XLA (real Mosaic, not interpret)
    ref = nn_xla(src, dst, dm)
    for qt, dt_ in ((256, 512), (256, 2048)):
        out = nn_pallas(src, dst, dm, q_tile=qt, db_tile=dt_, prune=True)
        same = int(np.sum(np.asarray(ref.index) == np.asarray(out.index)))
        dok = np.allclose(np.asarray(ref.dist_sq), np.asarray(out.dist_sq))
        print(f"parity pruned q={qt} db={dt_}: idx {same}/{PAD_TO} dist_ok={dok}")
        out2, pay = nn_pallas_matched(src, dst, dm, q_tile=qt, db_tile=dt_,
                                      prune=True)
        same2 = int(np.sum(np.asarray(ref.index) == np.asarray(out2.index)))
        gat = np.asarray(dst)[np.asarray(ref.index)]
        pok = np.array_equal(np.asarray(pay), gat)
        print(f"parity matched q={qt} db={dt_}: idx {same2}/{PAD_TO} pay_ok={pok}")

    # --- hardware parity on the sorted layout too
    ref_az = nn_xla(src_az, dst_az, dm_az)
    out = nn_pallas(src_az, dst_az, dm_az, q_tile=256, db_tile=512,
                    prune=True)
    same = int(np.sum(np.asarray(ref_az.index) == np.asarray(out.index)))
    print(f"parity pruned SORTED q=256 db=512: idx {same}/{PAD_TO}")

    # --- timing sweep
    for qt, dt_ in ((256, 512), (256, 1024), (256, 2048), (512, 512),
                    (512, 1024), (512, 2048), (1024, 512), (1024, 1024)):
        try:
            timed(f"PLAIN          q={qt} db={dt_}",
                  chain(lambda q, d, m, a=qt, b=dt_: nn_pallas(
                      q, d, m, q_tile=a, db_tile=b, prune=False)),
                  src, dst, dm)
            timed(f"PRUNED-sorted  q={qt} db={dt_}",
                  chain(lambda q, d, m, a=qt, b=dt_: nn_pallas(
                      q, d, m, q_tile=a, db_tile=b, prune=True)),
                  src_az, dst_az, dm_az)
            timed(f"PRUNED-shuffled q={qt} db={dt_}",
                  chain(lambda q, d, m, a=qt, b=dt_: nn_pallas(
                      q, d, m, q_tile=a, db_tile=b, prune=True)),
                  src_shuf, dst, dm)
        except Exception as e:
            print(f"q={qt} db={dt_} FAILED: {type(e).__name__}: {e}")

    # matched (payload) variants at the best plain config
    timed("MATCHED plain         q=256 db=2048",
          chain(lambda q, d, m: nn_pallas_matched(
              q, d, m, q_tile=256, db_tile=2048, prune=False)[0]),
          src, dst, dm)
    timed("MATCHED pruned-sorted q=256 db=2048",
          chain(lambda q, d, m: nn_pallas_matched(
              q, d, m, q_tile=256, db_tile=2048, prune=True)[0]),
          src_az, dst_az, dm_az)
    timed("MATCHED pruned-sorted q=256 db=512",
          chain(lambda q, d, m: nn_pallas_matched(
              q, d, m, q_tile=256, db_tile=512, prune=True)[0]),
          src_az, dst_az, dm_az)

    # p2l-shaped payload: point + normal + validity = 7 features riding
    # the carry (models/icp_p2l.py) vs separate gathers.
    pay7 = jnp.concatenate(
        [dst_az, dst_az, dm_az.astype(jnp.float32)[..., None]], axis=-1
    )
    for qt, dt_ in ((256, 2048), (256, 512)):
        timed(f"MATCHED-P7 pruned-sorted q={qt} db={dt_}",
              chain(lambda q, d, m, a=qt, b=dt_: nn_pallas_matched(
                  q, d, m, payload=pay7, q_tile=a, db_tile=b,
                  prune=True)[0]),
              src_az, dst_az, dm_az)
        timed(f"MATCHED-P7 plain          q={qt} db={dt_}",
              chain(lambda q, d, m, a=qt, b=dt_: nn_pallas_matched(
                  q, d, m, payload=pay7, q_tile=a, db_tile=b,
                  prune=False)[0]),
              src_az, dst_az, dm_az)

    @jax.jit
    def nn_plus_gathers(q, d, m):
        res = nn_pallas(q, d, m, q_tile=256, db_tile=2048, prune=True)
        matched = jnp.take_along_axis(d, res.index[..., None], axis=-2)
        matched_n = jnp.take_along_axis(d, res.index[..., None], axis=-2)
        ok = jnp.take_along_axis(m, res.index, axis=-1)
        return matched[0, 0] + matched_n[0, 0] + ok[0]

    out = nn_plus_gathers(src_az, dst_az, dm_az); np.asarray(out)
    t0 = time.perf_counter(); np.asarray(nn_plus_gathers(src_az, dst_az, dm_az))
    print(f"pruned NN + 3 gathers, 1 call (incl ~27ms tunnel): "
          f"{(time.perf_counter()-t0)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
