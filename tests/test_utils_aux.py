"""Metrics, checkpoint/resume, and profiling-hook smoke tests."""

import os

import numpy as np

from icp_rust_tpu.utils.checkpoint import SequenceCheckpointer, load_state, save_state
from icp_rust_tpu.utils.metrics import MetricsLogger


def test_metrics_jsonl_roundtrip(tmp_path):
    import json

    p = os.path.join(tmp_path, "m.jsonl")
    log = MetricsLogger(p)
    for i in range(3):
        log.start_frame()
        log.end_frame(i, huber_error=1.5 * i)
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert len(lines) == 3
    assert lines[2]["huber_error"] == 3.0
    assert log.summary()["frames"] == 3


def test_checkpoint_save_restore(tmp_path):
    p = os.path.join(tmp_path, "ckpt.npz")
    ck = SequenceCheckpointer(p, every=5)
    state = {"path": np.arange(10.0).reshape(5, 2), "t": np.eye(2)}
    assert not ck.maybe_save(3, state)      # not on the cadence
    assert ck.maybe_save(5, state)
    restored = ck.restore()
    assert int(restored["frame_cursor"]) == 5
    np.testing.assert_array_equal(restored["path"], state["path"])


def test_save_state_atomic_overwrite(tmp_path):
    p = os.path.join(tmp_path, "s.npz")
    save_state(p, {"a": np.ones(3)})
    save_state(p, {"a": np.zeros(3)})
    np.testing.assert_array_equal(load_state(p)["a"], np.zeros(3))


def test_compile_cache_writes_entries(tmp_path, monkeypatch):
    """enable() points JAX's persistent compilation cache at the dir and a
    jit compile actually lands an entry (min_compile_secs=0 so the tiny
    CPU program qualifies)."""
    import jax
    import jax.numpy as jnp

    from icp_rust_tpu.utils.compile_cache import enable

    cache_dir = os.path.join(tmp_path, "xla_cache")
    # Snapshot ALL three config values enable() touches so the rest of
    # the pytest session is unaffected (ADVICE r3: leaking
    # min_compile_time_secs=0 would make any later cache-enabled test
    # cache every tiny program).
    saved = {
        k: jax.config._read(k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    assert enable(cache_dir, min_compile_secs=0.0)
    try:
        @jax.jit
        def f(x):
            return jnp.sin(x) * 41.5  # unique constant: fresh cache key

        np.asarray(f(jnp.arange(8.0)))
        assert os.path.isdir(cache_dir) and os.listdir(cache_dir)
    finally:
        for k, v in saved.items():
            jax.config.update(k, v)


def test_compile_cache_opt_out(tmp_path, monkeypatch):
    from icp_rust_tpu.utils.compile_cache import enable

    monkeypatch.setenv("ICP_NO_COMPILE_CACHE", "1")
    assert not enable(os.path.join(tmp_path, "nope"))
    assert not os.path.exists(os.path.join(tmp_path, "nope"))
