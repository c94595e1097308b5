"""Device-mesh construction and multi-host initialization.

No reference counterpart (single-threaded crate); this is the framework's
runtime init path (SURVEY.md §3.5): process-group init for multi-host, mesh
construction over ICI, and AOT warm-up hooks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(**kwargs) -> None:
    """Multi-host process-group init (jax.distributed).

    Only the documented benign case — the process group is already
    initialized — is swallowed; every other failure (bad coordinator
    address, port conflict, mismatched process counts) re-raises so a
    multi-host misconfiguration cannot silently degrade to a
    single-process run.  Logs the resolved process/device counts.
    """
    import logging

    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    logging.getLogger(__name__).info(
        "jax.distributed: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def make_mesh(
    axis_names: Sequence[str] = ("dp", "sp"),
    axis_sizes: Sequence[int] | None = None,
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Default: all devices on one "dp" x "sp" grid; if axis_sizes is None the
    pair axis absorbs all devices and sp=1.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"axis sizes {axis_sizes} != device count {n}")
    dev_array = np.asarray(devices).reshape(*axis_sizes)
    return Mesh(dev_array, axis_names=tuple(axis_names))
