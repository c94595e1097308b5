"""Profiling and numeric-debug hooks (SURVEY.md §5).

- ``trace`` / ``annotate``: jax.profiler wrappers (Perfetto/XProf traces of
  kernel occupancy; view with tensorboard or ui.perfetto.dev).
- ``debug_mode``: enables jax's NaN/inf checking for a scope — the engine's
  'sanitizer' (the reference relies on Rust's compile-time guarantees; the
  numeric analogue here is runtime non-finite detection).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_mode():
    """NaN/inf checking for every op in the scope (slow; debugging only)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
