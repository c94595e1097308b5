#!/usr/bin/env python
"""Census: outer iterations to fixed point + inner GN iterations, per
frame of the bench sequence."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import _is_identity
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nearest_neighbor
from icp_rust_tpu.utils import io as scan_io

PAD_TO = 28800
N_FRAMES = 12


def main():
    path = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames = scan_io.load_scans3d_hdf5(path)[:N_FRAMES]
    pts, mask = scan_io.pad_points(frames, pad_to=PAD_TO)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    pts_j = jnp.asarray(pts, jnp.float32)
    msk = jnp.asarray(mask)
    src, sm = pts_j[0], msk[0]

    @jax.jit
    def outer_census(dst, dm, t):
        """One odometry frame; returns (t_final, n_outer, inner_iters[20])."""

        def transform_xy(t, p):
            xy = t.apply_points(p[..., :2])
            return jnp.concatenate([xy, p[..., 2:]], axis=-1)

        def body(carry, _):
            t, fixed, n = carry
            src_t = transform_xy(t, src)
            match = nearest_neighbor(src_t, dst, dm)
            matched = jnp.take_along_axis(
                dst, match.index[..., None], axis=-2)
            # inner loop with iteration count
            t0i = RigidTransform2.identity(dtype=jnp.float32)
            prev0 = jnp.float32(np.finfo(np.float32).max)

            def icond(c):
                _, _, done, it = c
                return (it < cfg.inner_max_iter) & ~done

            def ibody(c):
                ti, prev, done, it = c
                upd = align2d.weighted_gauss_newton_update(
                    ti, src_t[..., :2], matched[..., :2], sm,
                    cfg.huber_k, cfg.det_rel_eps)
                d2 = jnp.sum(upd.delta ** 2)
                stop = (~upd.ok) | (d2 < cfg.inner_delta_sq_tol) | (
                    upd.err > prev)
                t2 = RigidTransform2.from_twist(upd.delta).compose(ti)
                tn = RigidTransform2(jnp.where(stop, ti.rot, t2.rot),
                                     jnp.where(stop, ti.t, t2.t))
                return (tn, jnp.where(stop, prev, upd.err), stop, it + 1)

            dt, _, _, inner_n = jax.lax.while_loop(
                icond, ibody, (t0i, prev0, jnp.bool_(False), 0))
            new_fixed = fixed | _is_identity(dt)
            t_next = jax.tree_util.tree_map(
                lambda a, b: jnp.where(fixed, a, b), t,
                dt.compose(t))
            n = n + jnp.where(fixed, 0, 1)
            return (t_next, new_fixed, n), inner_n

        (t, _, n_outer), inner = jax.lax.scan(
            body, (t, jnp.bool_(False), 0), None, length=cfg.outer_iters)
        return t, n_outer, inner

    t = RigidTransform2.identity(dtype=jnp.float32)
    print("frame  n_outer  inner_iters(first 12 outer)")
    tot_o, tot_i = 0, 0
    for i in range(1, N_FRAMES):
        t, n_outer, inner = outer_census(pts_j[i], msk[i], t)
        inner = np.asarray(inner)
        n_o = int(n_outer)
        tot_o += n_o
        tot_i += int(inner[:n_o].sum())
        print(f"{i:4d}  {n_o:5d}    {inner[:12].tolist()}")
    print(f"total outer={tot_o} avg={tot_o/(N_FRAMES-1):.1f}  "
          f"total inner={tot_i} avg/outer={tot_i/max(tot_o,1):.2f}")


if __name__ == "__main__":
    main()
