#!/usr/bin/env python
"""Device-trace census of the PRODUCTION bench program (round-4 lesson:
trace the real fused odometry program, not a chain-differenced proxy —
op-count anomalies are invisible to difference quotients).

Captures a jax.profiler trace of one fused N-frame run_odometry_fused
call on the current backend, parses the XLA device plane from the
xplane.pb, and prints total device-busy time plus the top ops by summed
self-duration.  Usage:

    python benchmarks/profile_trace.py [n_frames] [top_k]
"""

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def capture(n_frames: int, log_dir: str):
    from icp_rust_tpu.config import ICPConfig
    from icp_rust_tpu.models.odometry import run_odometry_fused
    from icp_rust_tpu.utils import io as scan_io

    data = os.path.join(os.path.dirname(__file__), "data", "scans3d.hdf5")
    frames, _ = scan_io.ensure_scans3d(data, max(n_frames, 12), seed=0)
    frames = frames[:n_frames]
    cfg = ICPConfig(compute_dtype=jnp.float32, point_scale=1.0,
                    det_rel_eps=1e-9)
    pts, mask = scan_io.pad_points(frames, pad_to=28800)
    pts = jax.block_until_ready(jnp.asarray(pts, cfg.compute_dtype))
    mask = jax.block_until_ready(jnp.asarray(mask))
    _, path = run_odometry_fused(pts, mask, cfg)  # compile + warm
    np.asarray(path)
    jax.profiler.start_trace(log_dir)
    _, path = run_odometry_fused(pts, mask, cfg)
    np.asarray(path)  # tunnel: block_until_ready does not force execution
    jax.profiler.stop_trace()


def load_xspaces(log_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    spaces = []
    for p in glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def census(spaces, top_k: int):
    for xs in spaces:
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device" not in plane.name:
                continue
            ev_names = {m.id: m.name for m in plane.event_metadata.values()}
            by_name = collections.Counter()
            n_events = collections.Counter()
            t_lo, t_hi = float("inf"), 0.0
            busy = 0.0
            for line in plane.lines:
                # XLA op lines carry the per-op events; step lines etc.
                # are coarser — take the finest-granularity line set:
                # sum self-durations on 'XLA Ops'-style lines only.
                if not line.events:
                    continue
                lname = line.name or ""
                if lname and ("Steps" in lname or "step" in lname):
                    continue
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    dur = ev.duration_ps / 1e9  # -> ms... ps: 1e9 ps = 1ms
                    by_name[name] += dur
                    n_events[name] += 1
                    t0 = ev.offset_ps / 1e9
                    t_lo = min(t_lo, t0)
                    t_hi = max(t_hi, t0 + dur)
                    busy += dur
            if not by_name:
                continue
            print(f"\n== plane: {plane.name} (lines={len(plane.lines)}) ==")
            span = t_hi - t_lo
            print(f"span {span:.3f} ms, summed-event time {busy:.3f} ms "
                  f"(lines overlap; per-line views below)")
            for line in plane.lines:
                if not line.events:
                    continue
                tot = sum(ev.duration_ps for ev in line.events) / 1e9
                lo = min(ev.offset_ps for ev in line.events) / 1e9
                hi = max((ev.offset_ps + ev.duration_ps)
                         for ev in line.events) / 1e9
                print(f"  line '{line.name}': {len(line.events)} events, "
                      f"sum {tot:.3f} ms, span {hi - lo:.3f} ms")
            print(f"\n top {top_k} ops by summed duration (all lines):")
            for name, dur in by_name.most_common(top_k):
                print(f"  {dur:9.3f} ms  x{n_events[name]:6d}  {name[:90]}")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--parse-only":
        census(load_xspaces(sys.argv[2]),
               int(sys.argv[3]) if len(sys.argv) > 3 else 30)
        return
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    log_dir = os.environ.get("TRACE_DIR") or tempfile.mkdtemp(
        prefix="icp_trace_")
    print(f"backend={jax.default_backend()} frames={n_frames} "
          f"log_dir={log_dir}")
    capture(n_frames, log_dir)
    spaces = load_xspaces(log_dir)
    print(f"parsed {len(spaces)} xspace file(s)")
    census(spaces, top_k)


if __name__ == "__main__":
    main()
