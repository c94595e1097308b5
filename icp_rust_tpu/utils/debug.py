"""Numeric-safety and drift-gate utilities (SURVEY.md §5).

The reference's only "sanitizer" is Rust's compile-time borrow checker
plus debug_assert guards (src/lib.rs:223, src/huber.rs:7-8,
src/stats.rs:50).  The TPU-native equivalents here:

- ``checked``: wrap a function so every output leaf is scanned for
  NaN/Inf on the way out (jax.checkify for jittable error plumbing when
  available; plain post-hoc scan otherwise).  This is the "race
  detector" of a data-parallel numeric engine — silent NaNs are how a
  bad reduction shows up.
- ``assert_all_finite``: eager pytree finiteness check for tests and
  CLI --selfcheck paths.
- ``drift_gate``: run the same alignment in compute dtype and float64
  (CPU) and assert the result agrees within a tolerance — the
  golden-vs-f64 drift gate from SURVEY.md §5.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def assert_all_finite(tree, name: str = "value") -> None:
    """Raise FloatingPointError if any leaf holds NaN/Inf."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}: leaf {i} has {bad} non-finite element(s) "
                f"(shape {arr.shape}, dtype {arr.dtype})"
            )


def checked(fn: Callable) -> Callable:
    """Return a wrapper that runs ``fn`` and raises on non-finite
    outputs.  Works on jitted functions (the check happens on fetched
    outputs, so it adds one host sync)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        out = fn(*args, **kwargs)
        assert_all_finite(out, name=getattr(fn, "__name__", "output"))
        return out

    return wrapper


def drift_gate(
    run: Callable[[object], tuple],
    config_fast,
    config_ref,
    atol: float,
    name: str = "drift",
) -> float:
    """Run ``run(config)`` under the fast config and the f64 reference
    config; assert the first returned array agrees within ``atol`` and
    return the max abs drift.

    ``run`` must return array-like results whose first element is the
    quantity to gate (e.g. a trajectory)."""
    fast = np.asarray(run(config_fast)[0], dtype=np.float64)
    ref = np.asarray(run(config_ref)[0], dtype=np.float64)
    drift = float(np.max(np.abs(fast - ref)))
    if drift > atol:
        raise AssertionError(
            f"{name}: f32-vs-f64 drift {drift:.3e} exceeds atol {atol:.3e}"
        )
    return drift


def deterministic_repeat(fn: Callable, *args, repeats: int = 3):
    """Run ``fn`` repeatedly and assert bitwise-identical outputs — the
    deterministic-reduction test mode (XLA TPU reductions are
    deterministic; this catches accidental nondeterminism from e.g.
    unordered host-side accumulation)."""
    first = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(repeats - 1):
        again = jax.tree_util.tree_map(np.asarray, fn(*args))
        for a, b in zip(
            jax.tree_util.tree_leaves(first), jax.tree_util.tree_leaves(again)
        ):
            if not np.array_equal(a, b, equal_nan=True):
                raise AssertionError("nondeterministic output detected")
    return first
