"""Masked order statistics: median, MAD, robust sigma.

Behavioral parity with reference src/stats.rs:

- median of an even-length sample averages the two central order stats
  (src/stats.rs:23-27); odd-length takes element n/2 (src/stats.rs:18-21).
- MAD = median(|x - median(x)|) (src/stats.rs:30-37).
- sigma = 1.482602218505602 * MAD  (1/PPF(0.75), src/stats.rs:39-47).
- ``calc_stddevs`` computes sigma per residual dimension (src/stats.rs:49-60).

The reference uses quickselect on a mutable Vec; the TPU-native
equivalent is exact radix select (ops/select.py) — fixed-shape masked
histogram passes, ~6x cheaper than the full-sort fallback at 28k points.
Both are exact order statistics, so they agree to the bit; ``method=
"sort"`` keeps the sort path for cross-checks.  All functions accept
arbitrary leading batch dims and reduce over the last axis.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.ops.select import masked_median_radix

MAD_SCALE = 1.482602218505602  # 1 / PPF(0.75); reference src/stats.rs:42


def _masked_median_sort(x: Array, mask: Array):
    dtype = jnp.result_type(x)
    n_total = x.shape[-1]
    filled = jnp.where(mask, x, jnp.asarray(jnp.inf, dtype))
    s = jnp.sort(filled, axis=-1)
    n = jnp.sum(mask, axis=-1).astype(jnp.int32)  # (...,)
    valid = n > 0
    h = n // 2
    hi = jnp.clip(h, 0, n_total - 1)
    lo = jnp.clip(h - 1, 0, n_total - 1)
    v_hi = jnp.take_along_axis(s, hi[..., None], axis=-1)[..., 0]
    v_lo = jnp.take_along_axis(s, lo[..., None], axis=-1)[..., 0]
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(valid, med, jnp.zeros_like(med)), valid


def masked_median(x: Array, mask: Array, method: str = "radix"):
    """Median over the last axis counting only ``mask``-true lanes.

    Returns ``(median, valid)`` where ``valid`` is False iff no lane is
    true (the reference returns None for an empty input,
    src/stats.rs:15-17).  Even-length samples average the two central
    order stats (src/stats.rs:23-27).
    """
    if method == "sort":
        return _masked_median_sort(x, mask)
    return masked_median_radix(x, mask)


def masked_mad(x: Array, mask: Array):
    """Median absolute deviation over the last axis. Ref src/stats.rs:30-37."""
    med, valid = masked_median(x, mask)
    dev = jnp.abs(x - med[..., None])
    mad, _ = masked_median(dev, mask)
    return mad, valid


def masked_stddev(x: Array, mask: Array):
    """Robust sigma = MAD_SCALE * MAD. Ref src/stats.rs:39-47."""
    mad, valid = masked_mad(x, mask)
    return MAD_SCALE * mad, valid


def calc_stddevs(residuals: Array, mask: Array):
    """Per-dimension robust sigma of residuals.

    residuals: (..., N, D); mask: (..., N).  Returns (sigma (..., D),
    valid (...,)).  Parity: reference src/stats.rs:49-60 (sigma computed
    independently per residual dimension).
    """
    # Move D before N so the reduction axis is last: (..., D, N).
    r = jnp.swapaxes(residuals, -1, -2)
    sigma, valid = masked_stddev(r, mask[..., None, :])
    return sigma, valid[..., 0]
