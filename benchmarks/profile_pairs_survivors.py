#!/usr/bin/env python
"""Survivor-count census for the batched pairs NN (CPU, f32).

Replays the batched icp2d outer loop on scans/2d and, at each outer
iteration, evaluates the survivor-list pre-pass's chunk-prune test
exactly as _nn_pairs_list_impl does, histogramming how many of the
db chunks survive per (pair, subtile) row.  This bounds what the list
kernel can save: if p50 survivors ~ n_chunks, the bounds are too loose
(per-subtile max over 256 queries) and the attack must shrink the
bound granularity instead.

Run CPU: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python benchmarks/profile_pairs_survivors.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.models.icp2d import _spatial_sort
from icp_rust_tpu.ops import align2d
from icp_rust_tpu.ops.nn import nn_xla
from icp_rust_tpu.utils import io as scan_io

SCANS = os.environ.get("SCANS2D", "/root/reference/scans/2d")
Q_SUB = int(os.environ.get("Q_SUB", "256"))


def tile_boxes(db, m):  # db: (B, M, 2) sentinel-masked
    b, M, d = db.shape
    nc = M // 128
    c = db.reshape(b, nc, 128, d)
    return np.min(c, axis=2), np.max(c, axis=2)  # (B, nc, 2) each


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=210)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=3000.0,
                    det_rel_eps=1e-9)
    src = jnp.asarray(pts[:-1], jnp.float32) / cfg.point_scale
    dst = jnp.asarray(pts[1:], jnp.float32) / cfg.point_scale
    sm = jnp.asarray(mask[:-1])
    dm = jnp.asarray(mask[1:])
    src, sm, _ = _spatial_sort(src, sm)
    dst, dm, _ = _spatial_sort(dst, dm)
    b, n = src.shape[0], src.shape[1]
    nc = n // 128
    n_qt = n // Q_SUB

    # sentinel-mask db for box computation (mirrors the kernel prep)
    sent = 3.4e38 / 16
    dbm = np.where(np.asarray(dm)[..., None], np.asarray(dst), sent)
    clo, chi = tile_boxes(dbm, n)

    t = RigidTransform2.identity((b,), jnp.float32)
    prev_d2 = jnp.full((b, n), jnp.inf, jnp.float32)
    prev_q = src
    print(f"B={b} N={n} nc={nc} rows/outer={b*n_qt}")
    for outer in range(6):
        src_t = t.apply_points(src)
        move = jnp.linalg.norm(src_t - prev_q, axis=-1)
        ulp = 1.0 + 32.0 * np.finfo(np.float32).eps
        qb = (jnp.sqrt(prev_d2) + move) ** 2 * ulp

        if outer > 0:
            for q_sub in (256, 128, 64, 32):
                nt = n // q_sub
                q = np.asarray(src_t).reshape(b, nt, q_sub, 2)
                qlo = q.min(axis=2)
                qhi = q.max(axis=2)
                a = clo[:, None] - qhi[:, :, None]
                bb = qlo[:, :, None] - chi[:, None]
                g = np.maximum(np.maximum(a, bb), 0.0)
                lb = (g * g).sum(-1) * (1 - 16 * np.finfo(np.float32).eps)
                qbt = np.asarray(qb).reshape(b, nt, q_sub).max(-1)
                ok = lb <= qbt[..., None]
                cnt = ok.sum(-1).ravel()
                # chunk-VISIT work per pair ~ cnt * q_sub rows
                visits = cnt.reshape(b, nt).sum(-1) * q_sub
                # union of this granularity's tests at the 256-walk
                # (what _nn_pairs_list_impl's list_grp delivers)
                grp_per = 256 // q_sub
                if grp_per >= 1 and nt % (n // 256) == 0:
                    u = ok.reshape(b, n // 256, grp_per, nc).any(2)
                    ucnt = u.sum(-1).ravel()
                    uv = u.sum(-1).reshape(b, -1).sum(-1) * 256
                    extra = (f"; union@256 mean={ucnt.mean():.2f} "
                             f"visits={uv.mean():.0f}")
                else:
                    extra = ""
                print(f"outer {outer} q_sub={q_sub:4d}: survivors "
                      f"p50={np.percentile(cnt, 50):.0f} "
                      f"mean={cnt.mean():.2f} max={cnt.max()} (of {nc}); "
                      f"row-visits/pair mean={visits.mean():.0f} "
                      f"(full sweep={nc*n}){extra}")

        res = nn_xla(src_t, dst, dm)
        matched = jnp.take_along_axis(dst, res.index[..., None], axis=-2)
        dt = align2d.estimate_transform(src_t, matched, sm, cfg)
        t = dt.compose(t)
        prev_d2, prev_q = res.dist_sq, src_t


if __name__ == "__main__":
    main()
