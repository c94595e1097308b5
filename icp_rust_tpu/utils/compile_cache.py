"""Persistent XLA compilation cache — the framework's warm-start init.

The reference has no init path at all (SURVEY.md §3.5: the KdTree build is
its only setup).  This framework's real startup cost is XLA compilation of
the fused sequence programs (~20-40 s cold per program on TPU).  The JAX
persistent compilation cache turns every repeat invocation of an unchanged
program (CLI re-runs, bench reps across processes, resumed sequences) into
a disk hit instead of a recompile.

Opt-out: ICP_NO_COMPILE_CACHE=1.  Cache dir resolution order:
explicit argument > $ICP_COMPILE_CACHE_DIR > <repo>/.xla_compile_cache
(repo-local, gitignored) when running from a checkout, else
~/.cache/icp_rust_tpu/xla.
"""

from __future__ import annotations

import os

def _default_dir() -> str:
    """Repo-local cache when running from a checkout; otherwise a user
    cache dir (an installed package's parent is site-packages — writing
    there may fail or pollute the install; ADVICE r3)."""
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.path.exists(os.path.join(pkg_parent, "bench.py")):
        return os.path.join(pkg_parent, ".xla_compile_cache")
    base = os.environ.get(
        "XDG_CACHE_HOME", os.path.join(os.path.expanduser("~"), ".cache")
    )
    return os.path.join(base, "icp_rust_tpu", "xla")


def enable(path: str | None = None, min_compile_secs: float = 2.0) -> bool:
    """Point JAX's persistent compilation cache at ``path`` and enable it.

    Returns True if the cache is active.  ``min_compile_secs`` skips
    caching trivial programs (the fused sequence programs this exists for
    compile in tens of seconds); tests pass 0 to cache everything.
    Safe to call more than once; a failure (old jax, read-only disk)
    degrades to uncached compiles rather than raising.
    """
    if os.environ.get("ICP_NO_COMPILE_CACHE") == "1":
        return False
    import jax

    path = path or os.environ.get("ICP_COMPILE_CACHE_DIR") or _default_dir()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_secs),
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - config name drift across jax
        return False
    return True
