"""Exact masked order statistics via radix select — no sort.

The reference computes its robust scale from medians via quickselect
(src/stats.rs:11-28).  A full ``jnp.sort`` per GN iteration is the naive
TPU translation but costs ~2 ms at 28k points; selection only needs the
k-th order statistic.  Radix select is the TPU-native quickselect: map
floats to order-preserving unsigned bit keys, then narrow the candidate
set digit by digit (4 bits per pass, 8 passes for f32, 16 for f64) using
16-bin masked histograms — pure fixed-shape VPU reductions, no
data-dependent shapes, exact to the bit.

Per pass: histogram the active candidates' current digit, find the bin
containing rank k, subtract the lower bins' mass from k, and keep only
that bin's candidates.  After all passes the surviving candidates share
one full key (duplicates included), whose float value is the k-th order
statistic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def _order_keys(x: Array):
    """Monotone map: float -> unsigned int with the same total order.

    IEEE754 trick: flip all bits of negatives, flip only the sign bit of
    non-negatives.  (+inf maps above every finite value, so masked lanes
    filled with +inf sort last.)
    """
    nbits = x.dtype.itemsize * 8
    ut = jnp.uint32 if nbits == 32 else jnp.uint64
    b = jax.lax.bitcast_convert_type(x, ut)
    sign = b >> (nbits - 1)
    allf = ~ut(0)
    topb = ut(1) << (nbits - 1)
    return b ^ jnp.where(sign == 1, allf, topb), nbits


def kth_smallest_masked(
    x: Array, mask: Array, k: Array, digit_bits: int = 8
) -> Array:
    """Exact k-th smallest (0-based) of the mask-true lanes of x.

    x: (..., N); mask: (..., N) bool; k: (...,) int32 with
    0 <= k < count(mask).  Returns (...,) with x.dtype.  Undefined where
    the count is 0 or k is out of range (callers gate on validity).

    digit_bits: radix width per pass (8 -> 4 passes of 256 bins for f32;
    4 -> 8 passes of 16 bins).  Wider digits mean fewer passes; the
    histogram compare-reduce stays fused either way.
    """
    keys, nbits = _order_keys(x)
    cand = mask
    r = k.astype(jnp.int32)
    nbins = 1 << digit_bits
    bmask = nbins - 1
    bins = jnp.arange(nbins, dtype=jnp.uint32 if nbits == 32 else jnp.uint64)

    for p in range(nbits // digit_bits):
        shift = nbits - digit_bits * (p + 1)
        digit = (keys >> shift) & bmask  # (..., N)
        # Masked 16-bin histogram, then cumulative counts: (..., 16).
        onehot = (digit[..., None] == bins) & cand[..., None]
        cum = jnp.cumsum(
            jnp.sum(onehot, axis=-2, dtype=jnp.int32), axis=-1
        )
        # Selected bin: first with cum > r.
        over = cum > r[..., None]
        sel = jnp.argmax(over, axis=-1).astype(
            jnp.uint32 if nbits == 32 else jnp.uint64
        )
        below = jnp.where(
            sel > 0,
            jnp.take_along_axis(
                cum, jnp.maximum(sel.astype(jnp.int32) - 1, 0)[..., None],
                axis=-1,
            )[..., 0],
            0,
        )
        r = r - below
        cand = cand & (digit == sel[..., None])

    # All surviving candidates carry the identical key -> same value.
    big = jnp.asarray(jnp.inf, x.dtype)
    return jnp.min(jnp.where(cand, x, big), axis=-1)


def masked_median_radix(x: Array, mask: Array):
    """Median over the last axis counting only mask-true lanes.

    Same contract and bit-exact results as robust.masked_median (the
    reference's even-length two-order-stat average, src/stats.rs:18-27),
    computed by two radix selects instead of a sort.
    """
    n = jnp.sum(mask, axis=-1).astype(jnp.int32)
    valid = n > 0
    h = n // 2
    v_hi = kth_smallest_masked(x, mask, jnp.maximum(h, 0))
    # The lower order stat s[h-1] (needed for even counts) does not need a
    # second full select: if exactly h elements are < s[h] then s[h-1] is
    # the max of them; otherwise s[h-1] duplicates s[h].  One count pass +
    # one masked max — exact.
    less = mask & (x < v_hi[..., None])
    cnt_less = jnp.sum(less, axis=-1).astype(jnp.int32)
    vmax_less = jnp.max(
        jnp.where(less, x, jnp.asarray(-jnp.inf, x.dtype)), axis=-1
    )
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(valid, med, jnp.zeros_like(med)), valid
