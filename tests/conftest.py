"""Test harness setup.

Tests run on a virtual 8-device CPU mesh (the standard JAX stand-in for a
pod, per SURVEY.md §4) with float64 enabled so the parity suite can compare
against the reference's f64 semantics exactly.

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin at interpreter start; initializing that backend dials a remote
TPU and costs ~80s.  We switch the already-imported jax to CPU and drop the
axon factory before any backend initialization happens.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)
