#!/usr/bin/env python
"""Scaling-efficiency harness (north-star: >=80% efficiency 1 -> N).

Real multi-chip hardware is not reachable from this environment (one
tunnelled TPU core), so this harness has two modes:

- default (CPU, virtual devices): mechanical validation of the dp x sp
  shard_map program — it partitions, the collectives (psum GN reduction,
  ring-ppermute NN, all_gather sigma) run, and the batched throughput
  scales across the fake mesh.  Wall-clock efficiency on a host CPU is
  NOT the quantity of interest (the 'devices' share one socket); the
  number that matters on real hardware comes from running this same
  script there.
- on a real multi-chip slice: run with JAX_PLATFORMS unset and it
  reports pairs/s at mesh sizes 1, 2, ..., N plus efficiency vs linear.

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALING_CPU", "1") == "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count="
        + os.environ.get("SCALING_DEVICES", "8")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

if jax.default_backend() != "tpu":
    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.parallel import make_mesh
from icp_rust_tpu.parallel.sharded import dp_sp_icp2d
from icp_rust_tpu.utils import io as scan_io


def main():
    n_dev = len(jax.devices())
    frames = scan_io.load_scan2d_sequence(
        "/root/reference/scans/2d", limit=33
    )
    pts, mask = scan_io.pad_points(frames, multiple=256)
    cfg = ICPConfig(
        compute_dtype=jnp.float32, point_scale=3000.0, det_rel_eps=1e-9,
        outer_iters=5, nn_dst_tile=256,
    )
    b_total = 32
    src = jnp.asarray(pts[:-1][:b_total], cfg.compute_dtype)
    dst = jnp.asarray(pts[1:][:b_total], cfg.compute_dtype)
    sm = jnp.asarray(mask[:-1][:b_total])
    dm = jnp.asarray(mask[1:][:b_total])
    t0s = RigidTransform2.identity((b_total,), cfg.compute_dtype)

    sizes = [s for s in (1, 2, 4, 8, 16) if s <= n_dev]

    def sweep(metric, mesh_shape_for, make_fn, args, batch):
        base = None
        for s in sizes:
            dp, sp = mesh_shape_for(s)
            mesh = make_mesh(("dp", "sp"), (dp, sp),
                             devices=jax.devices()[:s])
            fn = make_fn(mesh)
            out = fn(*args)
            np.asarray(out.t)  # axon tunnel: block_until_ready does
            t0 = time.perf_counter()  # NOT force execution — fetch.
            for _ in range(3):
                out = fn(*args)
            np.asarray(out.t)
            dt = (time.perf_counter() - t0) / 3
            pps = batch / dt
            if base is None:
                base = pps
            print(json.dumps({
                "metric": metric,
                "mesh": f"dp={dp},sp={sp}",
                "value": round(pps, 2),
                "efficiency_vs_linear": round(pps / (base * s), 3),
                "backend": jax.default_backend(),
            }))

    sweep(
        "dp_scaling_pairs_per_s", lambda s: (s, 1),
        lambda mesh: jax.jit(
            lambda *a, m=mesh: dp_sp_icp2d(*a, config=cfg, mesh=m)),
        (src, dst, sm, dm, t0s), b_total,
    )

    # The HEADLINE workload (3D match / SE(2)-on-xy solve) over dp x sp:
    # point axis sharded (ring NN + psum GN) with pairs data-parallel.
    from icp_rust_tpu.parallel.sharded import dp_sp_icp3d_planar

    rng = np.random.default_rng(0)
    b3, n3 = 8, 1024
    src3 = jnp.asarray(rng.uniform(-3, 3, (b3, n3, 3)), cfg.compute_dtype)
    dst3 = src3.at[..., :2].add(
        jnp.asarray([0.05, -0.02], cfg.compute_dtype))
    m3 = jnp.ones((b3, n3), bool)
    t03 = RigidTransform2.identity((b3,), cfg.compute_dtype)
    cfg3 = ICPConfig(
        compute_dtype=jnp.float32, det_rel_eps=1e-9, outer_iters=5,
        nn_dst_tile=256,
    )
    sweep(
        "dpsp_scaling_3d_pairs_per_s",
        lambda s: (2, s // 2) if s >= 2 else (1, 1),
        lambda mesh: jax.jit(
            lambda *a, m=mesh: dp_sp_icp3d_planar(
                *a, config=cfg3, mesh=m)),
        (src3, dst3, m3, m3, t03), b3,
    )


if __name__ == "__main__":
    main()
