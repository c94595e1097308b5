"""Hardware-tier gate for published TPU numbers.

The reference runs its ENTIRE suite on its actual platform before anything
ships (/root/reference/.github/workflows/test.yml:10-26).  The TPU
counterpart of that guarantee is the compiled-Mosaic hardware tier
(``ICP_TPU_TESTS=1 pytest -m tpu``): interpret mode has diverged from
compiled Mosaic more than once, so numbers published from a TPU run are
only trustworthy if that tier is green for the code being benchmarked.

``ensure_tier_green()`` is called by bench.py before it prints results on
a TPU backend: if a stamp newer than every package/hardware-test source
file records a green tier, it returns immediately; otherwise it runs the
tier right there (a subprocess, so the bench process's own backend state
is untouched) and stamps on success.  A red tier aborts the bench — no
number is published from unverified kernels.

Env:
  ICP_SKIP_TIER_GATE=1   bypass (CPU smoke runs, debugging)
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = os.path.join(REPO, "benchmarks", ".tpu_tier_stamp.json")


def _tpu_backend_selected() -> bool:
    """The sitecustomize forces JAX_PLATFORMS=axon unless overridden."""
    plat = os.environ.get("JAX_PLATFORMS", "axon").lower()
    return not plat.startswith("cpu")


def _sources_mtime() -> float:
    paths = glob.glob(os.path.join(REPO, "icp_rust_tpu", "**", "*.py"),
                      recursive=True)
    paths.append(os.path.join(REPO, "tests", "test_tpu_hardware.py"))
    return max(os.path.getmtime(p) for p in paths if os.path.exists(p))


def tier_is_stamped_green() -> bool:
    if not os.path.exists(STAMP):
        return False
    try:
        with open(STAMP) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return bool(rec.get("passed")) and rec["time"] >= _sources_mtime()


def run_tier() -> bool:
    env = dict(os.environ, ICP_TPU_TESTS="1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests", "-m", "tpu", "-q"],
        cwd=REPO, env=env,
    )
    if proc.returncode == 0:
        with open(STAMP, "w") as f:
            json.dump({"passed": True, "time": time.time()}, f)
        return True
    return False


def ensure_tier_green() -> None:
    if os.environ.get("ICP_SKIP_TIER_GATE") == "1":
        return
    if not _tpu_backend_selected():
        return  # CPU runs are smoke only; the CPU tier gates those in CI
    if tier_is_stamped_green():
        return
    print(
        "# tier gate: no fresh green stamp for the TPU hardware tier — "
        "running ICP_TPU_TESTS=1 pytest -m tpu before publishing numbers",
        file=sys.stderr,
    )
    if not run_tier():
        print("# tier gate: HARDWARE TIER RED — refusing to publish "
              "benchmark numbers from unverified kernels", file=sys.stderr)
        sys.exit(1)
