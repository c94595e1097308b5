"""Test harness setup.

Default tier: tests run on a virtual 8-device CPU mesh (the standard JAX
stand-in for a pod, per SURVEY.md §4) with float64 enabled so the parity
suite can compare against the reference's f64 semantics exactly.

Hardware tier (`ICP_TPU_TESTS=1 python -m pytest tests -m tpu`): keeps the
machine's axon TPU backend (remote dial ~80 s) and runs the @pytest.mark.tpu
tests — real-Mosaic kernel parity, not interpret mode (VERDICT r1 #3:
interpret already diverged from Mosaic twice).  f64 stays off — TPU has no
native f64 and the hardware tier tests the f32 production path.

Note: this environment's sitecustomize imports jax and registers the 'axon'
TPU plugin at interpreter start; initializing that backend dials a remote
TPU and costs ~80s.  For the CPU tier we switch the already-imported jax to
CPU and drop the axon factory before any backend initialization happens.
"""

import os

import pytest

TPU_TIER = os.environ.get("ICP_TPU_TESTS") == "1"

if not TPU_TIER:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from jax._src import xla_bridge

    xla_bridge._backend_factories.pop("axon", None)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Free compiled XLA executables after each test module.

    The full CPU suite compiles several hundred programs (8 virtual
    devices, x64) in one process; with jax/jaxlib 0.9.0 the run
    reproducibly segfaulted inside ``backend_compile_and_load`` (LLVM
    CPU JIT) after ~200 accumulated compilations — the same test passes
    standalone, and a suite-tail subset passes too, so the crash
    follows accumulated compiler state, not any one program.  Dropping
    executables between modules keeps the in-process footprint bounded;
    modules recompile what they share (small — each module mostly
    compiles its own shapes)."""
    yield
    if not TPU_TIER:
        import jax

        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    if TPU_TIER:
        # Even without `-m tpu` on the command line, never run the CPU/f64
        # parity tier against the remote axon TPU backend (slow remote dial
        # plus guaranteed dtype failures with x64 off) — deselect non-tpu
        # items here (ADVICE r2 #5).
        skip_cpu = pytest.mark.skip(
            reason="CPU/f64 parity tier (run without ICP_TPU_TESTS)"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip_cpu)
        return
    skip = pytest.mark.skip(
        reason="TPU hardware tier (run with ICP_TPU_TESTS=1 -m tpu)"
    )
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
