#!/usr/bin/env python
"""Measure the single-CPU baseline frames/s on the bench workload.

The reference publishes no performance numbers (BASELINE.md), so the
baseline is this machine's CPU running the reference algorithm on the
identical scans/3d workload.  Preference order:

1. the native C++ oracle (icp_rust_tpu/native: KD-tree + f64 GN — the
   closest stand-in for the Rust crate), when built;
2. the NumPy + scipy.cKDTree oracle.

Writes benchmarks/BASELINE_MEASURED.json, which bench.py reads.
Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python benchmarks/measure_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "benchmarks", "data", "scans3d.hdf5")
OUT = os.path.join(REPO, "benchmarks", "BASELINE_MEASURED.json")


def main():
    from icp_rust_tpu.utils import io as scan_io

    n_frames = int(os.environ.get("BENCH_FRAMES", "12"))
    os.makedirs(os.path.dirname(DATA), exist_ok=True)
    if not os.path.exists(DATA):
        scan_io.synthesize_scans3d(DATA, n_frames=n_frames, seed=0)
    frames = scan_io.load_scans3d_hdf5(DATA)[:n_frames]

    impl = None
    try:
        from icp_rust_tpu.native import oracle as native_oracle

        if native_oracle.available():
            impl = "native_cpp_kdtree"
            t0 = time.perf_counter()
            native_oracle.run_odometry3d(frames)
            elapsed = time.perf_counter() - t0
    except ImportError:
        pass

    if impl is None:
        from icp_rust_tpu.utils import oracle_np

        impl = "numpy_ckdtree"
        t0 = time.perf_counter()
        oracle_np.run_odometry3d(frames)
        elapsed = time.perf_counter() - t0

    fps = (len(frames) - 1) / elapsed
    result = {
        "cpu_frames_per_s": round(fps, 4),
        "impl": impl,
        "n_frames": len(frames),
        "points_per_frame": int(np.mean([len(f) for f in frames])),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
