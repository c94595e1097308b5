#!/usr/bin/env python
"""Batched multi-pair ICP throughput (BASELINE.json configs[2]): align
ALL consecutive scans/2d pairs in one vmapped solve.

This is the throughput shape of the engine — where the sequential
odometry benchmark measures latency (one warm-started chain), this
measures how many independent alignments one chip sustains when the
pair axis fills the machine.  Prints one JSON line (pairs/s + ATE-style
gate vs the native oracle's per-pair transforms)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.parallel.sharded import batched_icp2d
from icp_rust_tpu.utils import io as scan_io

SCANS = os.environ.get("SCANS2D", "/root/reference/scans/2d")
N_PAIRS = int(os.environ.get("BENCH_PAIRS", "209"))
REPS = int(os.environ.get("BENCH_REPS", "5"))


def main():
    frames = scan_io.load_scan2d_sequence(SCANS, limit=N_PAIRS + 1)
    pts, mask = scan_io.pad_points(frames, multiple=128)
    cfg = ICPConfig(
        compute_dtype=jnp.float32, point_scale=3000.0, det_rel_eps=1e-9,
    )
    # consecutive pairs: src = frame i, dst = frame i+1
    src = jax.block_until_ready(jnp.asarray(pts[:-1], cfg.compute_dtype))
    dst = jax.block_until_ready(jnp.asarray(pts[1:], cfg.compute_dtype))
    sm = jax.block_until_ready(jnp.asarray(mask[:-1]))
    dm = jax.block_until_ready(jnp.asarray(mask[1:]))
    b = src.shape[0]
    t0s = RigidTransform2.identity((b,), cfg.compute_dtype)

    run = jax.jit(lambda *a: batched_icp2d(*a, config=cfg))
    out = run(src, dst, sm, dm, t0s)
    jax.block_until_ready(out.t)
    np.asarray(out.t[0])  # force

    t0 = time.perf_counter()
    for _ in range(REPS):
        out = run(src, dst, sm, dm, t0s)
    np.asarray(out.t[0])
    dt = (time.perf_counter() - t0) / REPS
    pairs_per_s = b / dt

    # accuracy gate: compare per-pair translations with the native oracle
    err = None
    try:
        from icp_rust_tpu.native import oracle as native

        if native.available():
            n_chk = min(20, b)
            errs = []
            for i in range(n_chk):
                rt = native.icp2d_estimate(frames[i], frames[i + 1])
                _, t_ref = native.rt_to_matrices(rt)
                errs.append(np.linalg.norm(np.asarray(out.t[i]) - t_ref))
            err = float(np.max(errs))
    except Exception:
        pass

    print(json.dumps({
        "metric": "icp2d_batched_pairs_per_s_per_chip",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "pairs": b,
        "max_translation_err_vs_oracle_mm": (
            round(err, 4) if err is not None else None),
    }))


if __name__ == "__main__":
    main()
