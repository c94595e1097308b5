#!/usr/bin/env python
"""Per-phase budget of one fused-submap frame (round 3).

Phases: (a) hash-map insert (8 probe rounds), (b) map-view Morton
argsort + gather, (c) the warm ICP align (NN + inner) via the driver,
(d) centroids gather.  Chain-differenced on device.
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
from icp_rust_tpu.models.icp2d import icp3d_planar
from icp_rust_tpu.ops import voxel_hash as vh
from icp_rust_tpu.ops.nn import morton_order
from icp_rust_tpu.utils import io as scan_io

CAP = 1 << 16


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
    print(f"{name:44s} {per*1e3:9.3f} ms/iter")
    return per


def main():
    frames = scan_io.load_scans3d_hdf5(
        os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5"))[:4]
    pts, mask = scan_io.pad_points(frames, pad_to=28800)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    p0 = jnp.asarray(pts[0], jnp.float32)
    m0 = jnp.asarray(mask[0])
    scan = jnp.asarray(pts[1], jnp.float32)
    smask = jnp.asarray(mask[1])
    print(f"platform={jax.devices()[0].platform}")

    origin = vh.origin_for(p0, m0, 0.05)
    m = vh.make_map(CAP, 3, origin, jnp.float32)
    m, _ = vh.insert(m, p0, m0, 0.05, 8)
    mp, mm = vh.centroids(m)
    order = morton_order(mp, mm)
    mp_s, mm_s = mp[order], mm[order]
    qorder = morton_order(scan, smask)
    scan_s = scan[qorder]
    smask_s = smask[qorder]

    def ins(k):
        def run(mkey, mpsum, mcnt, morig, s, sm):
            mm_ = vh.VoxelHashMap(mkey, mpsum, mcnt, morig)
            def body(i, carry):
                mm_, acc = carry
                mm2, d = vh.insert(mm_, s + acc * 1e-30, sm, 0.05, 8)
                return (mm2, acc + d.astype(jnp.float32))
            mm2, acc = jax.lax.fori_loop(0, k, body, (mm_, jnp.float32(0)))
            return acc + mm2.cnt[0]
        return run

    diff("vh.insert (8 probes, 28800 pts)", ins, 1, 5,
         m.key, m.psum, m.cnt, m.origin, scan, smask)

    def srt(k):
        def run(mpts, mmask):
            def body(i, acc):
                o = morton_order(mpts + acc * 1e-30, mmask)
                g = mpts[o]
                return acc + g[0, 0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    diff("map morton argsort + gather (65536)", srt, 1, 5, mp, mm)

    def cent(k):
        def run(mkey, mpsum, mcnt, morig):
            mm_ = vh.VoxelHashMap(mkey, mpsum, mcnt, morig)
            def body(i, acc):
                cp, cm = vh.centroids(mm_)
                return acc + cp[0, 0] * 1e-30 + acc * 0
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    diff("vh.centroids (65536)", cent, 1, 9, m.key, m.psum, m.cnt, m.origin)

    def align(k):
        def run(s, sm, d, dm):
            def body(i, acc):
                t = icp3d_planar(
                    s, d, sm, dm,
                    RigidTransform2.identity(dtype=jnp.float32),
                    cfg.with_(nn_sort="none"))
                return acc + t.t[0]
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    diff("icp3d_planar scan-vs-map (sorted, 65536 db)", align, 1, 4,
         scan_s, smask_s, mp_s, mm_s)


if __name__ == "__main__":
    main()
