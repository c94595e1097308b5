"""Huber loss on *squared* errors, batched.

Behavioral parity with reference src/huber.rs:6-26 — note the reference's
convention: both functions take the squared residual ``e``:

- ``rho(e, k) = e``                if e <= k^2, else ``2 k sqrt(e) - k^2``
- ``drho(e, k) = d rho / d e = 1`` if e <= k^2, else ``k / sqrt(e)``

``drho`` is used directly as the IRLS weight (reference src/lib.rs:250).
Both are dimensionally scale-covariant, which is what makes the engine's
point_scale preconditioning exact (see config.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def rho(e: Array, k: float) -> Array:
    k2 = k * k
    safe_e = jnp.maximum(e, 0.0)
    return jnp.where(e <= k2, e, 2.0 * k * jnp.sqrt(safe_e) - k2)


def drho(e: Array, k: float) -> Array:
    k2 = k * k
    # Guard the unselected branch: for e < tiny the e <= k^2 branch wins,
    # but jnp.where still evaluates k/sqrt(e).
    tiny = jnp.finfo(jnp.result_type(e)).tiny
    safe_e = jnp.maximum(e, tiny)
    return jnp.where(e <= k2, jnp.ones_like(e), k / jnp.sqrt(safe_e))
