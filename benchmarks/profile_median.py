#!/usr/bin/env python
"""Median-select kernel variants, measured in isolation (VERDICT r2 #2).

The batched whole-loop IRLS kernel's per-iteration cost is ~85-90%
the two exact masked medians (med + MAD), each a 16-pass 2-bit radix
with 3 where-sum counts per pass over (2*_PAIR_BLK, N).  This measures
drop-in alternatives on realistic mixed-sign residual rows:

  radix2   current 16-pass 2-bit, 3 where-sums/pass
  radix1   32-pass 1-bit, 1 where-sum/pass
  bisect   key-space bisection from [kmin, kmax], dynamic while
  radix2w  16-pass 2-bit, digit-weighted sums (3 mul-sums sharing one
           masked digit array)

Each variant is run inside ONE pallas kernel looping K iterations with a
data perturbation per iteration (mirrors the IRLS loop), and timed by
chain-differencing K=4 vs K=20.  Correctness is asserted against
numpy medians before timing.

Run on the real TPU: `python benchmarks/profile_median.py`.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_rust_tpu.ops.align2d_pallas import (
    _median_radix2_rows,
    _order_keys_u32,
)

B = 128   # rows (= 2 * _PAIR_BLK in the real kernel)
N = 768


def _median_radix1_rows(x, mask, n):
    keys = _order_keys_u32(x)
    h = n // 2
    cand = mask
    r = h
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for p in range(32):
        shift = 31 - p
        bit0 = ((keys >> shift) & 1) == 0
        c0 = jnp.sum(jnp.where(cand & bit0, one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        take0 = r < c0
        cand = cand & (bit0 == take0)
        r = jnp.where(take0, r, r - c0)
    inf = jnp.float32(jnp.inf)
    v_hi = jnp.min(jnp.where(cand, x, inf), axis=1, keepdims=True)
    less = mask & (x < v_hi)
    cnt_less = jnp.sum(jnp.where(less, one, zero), axis=1,
                       keepdims=True).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -inf), axis=1, keepdims=True)
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


def _median_bisect_rows(x, mask, n):
    # int32-ordered keys (Mosaic has no unsigned reductions): flip the
    # top bit of the u32 order key and bitcast — order preserved.
    keys = jax.lax.bitcast_convert_type(
        _order_keys_u32(x) ^ jnp.uint32(0x80000000), jnp.int32)
    h = n // 2
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    imin = jnp.int32(-2147483648)
    imax = jnp.int32(2147483647)
    kmax_u = jnp.max(jnp.where(mask, keys, imin), axis=1, keepdims=True)
    kmin_u = jnp.min(jnp.where(mask, keys, imax), axis=1, keepdims=True)

    def cond(c):
        lo, hi = c
        return jnp.any(lo < hi)

    def body(c):
        lo, hi = c
        mid = lo + ((hi - lo) >> 1)
        # count of keys <= mid among masked
        cnt = jnp.sum(jnp.where(mask & (keys <= mid), one, zero),
                      axis=1, keepdims=True).astype(jnp.int32)
        go_lo = cnt > h  # k-th (0-indexed h) is <= mid
        hi2 = jnp.where(go_lo, mid, hi)
        lo2 = jnp.where(go_lo, lo, mid + 1)
        return lo2, hi2

    lo, hi = jax.lax.while_loop(cond, body, (kmin_u, kmax_u))
    # lo is the key of the h-th smallest; recover value via min over
    # matching keys (handles the value bit pattern exactly)
    v_hi = jnp.min(jnp.where(mask & (keys == lo), x, jnp.inf), axis=1,
                   keepdims=True)
    less = mask & (x < v_hi)
    cnt_less = jnp.sum(jnp.where(less, one, zero), axis=1,
                       keepdims=True).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -jnp.inf), axis=1,
                        keepdims=True)
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


def _median_radix2w_rows(x, mask, n):
    keys = _order_keys_u32(x)
    h = n // 2
    cand = mask
    r = h
    zero = jnp.float32(0.0)
    t = jnp.sum(jnp.where(mask, jnp.float32(1.0), zero), axis=1,
                keepdims=True).astype(jnp.int32)
    for p in range(16):
        shift = 30 - 2 * p
        d = jax.lax.bitcast_convert_type(
            (keys >> shift) & 0x3, jnp.int32).astype(jnp.float32)
        dm = jnp.where(cand, d, zero)
        d2m = dm * d
        s1 = jnp.sum(dm, axis=1, keepdims=True)
        s2 = jnp.sum(d2m, axis=1, keepdims=True)
        s3 = jnp.sum(d2m * d, axis=1, keepdims=True)
        # solve c1+2c2+3c3=s1, c1+4c2+9c3=s2, c1+8c2+27c3=s3
        c3 = (s3 - 3.0 * s2 + 2.0 * s1) / 6.0
        c2 = (s2 - s1) * 0.5 - 3.0 * c3
        c1 = s1 - 2.0 * c2 - 3.0 * c3
        # integer-valued in exact arithmetic; round (astype truncates)
        c1 = (c1 + 0.5).astype(jnp.int32)
        c2 = (c2 + 0.5).astype(jnp.int32)
        c3 = (c3 + 0.5).astype(jnp.int32)
        c0 = t - c1 - c2 - c3
        cum1 = c0 + c1
        cum2 = cum1 + c2
        sel = jnp.where(
            r < c0, 0, jnp.where(r < cum1, 1, jnp.where(r < cum2, 2, 3))
        ).astype(jnp.uint32)
        r = r - jnp.where(
            sel == 0, 0, jnp.where(sel == 1, c0,
                                   jnp.where(sel == 2, cum1, cum2))
        )
        seln = jnp.where(
            sel == 0, 0, jnp.where(sel == 1, c1,
                                   jnp.where(sel == 2, c2, c3)))
        t = seln
        cand = cand & (((keys >> shift) & 0x3) == sel)
    inf = jnp.float32(jnp.inf)
    v_hi = jnp.min(jnp.where(cand, x, inf), axis=1, keepdims=True)
    less = mask & (x < v_hi)
    one = jnp.float32(1.0)
    cnt_less = jnp.sum(jnp.where(less, one, zero), axis=1,
                       keepdims=True).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -inf), axis=1, keepdims=True)
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


def _median_radixd_rows(x, mask, n):
    """Sign-split dynamic-exit radix select.

    The h-th smallest SIGNED value is recovered from a select over
    |x| int32 bit-keys restricted to one sign class (negatives hold
    ranks 0..n_neg-1 in descending |x|).  Nonneg float bits are
    order-isomorphic int32 keys (sign bit 0), so all shift/compare
    logic is plain int32.  The 2-bit passes run in a lax.while_loop
    with per-row state and exit a row as soon as its rank pins to an
    endpoint of the candidate set (r == 0 -> min over cand,
    r == cnt-1 -> max over cand) — with ~666 points the candidate
    count shrinks ~4x per pass, so typical depth is ~5-7 passes, not
    16.  A shift<0 exit means all candidate keys are equal (any rank
    gives the same value; min works)."""
    neg = mask & (x < 0)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    n_neg = jnp.sum(jnp.where(neg, one, zero), axis=1,
                    keepdims=True).astype(jnp.int32)
    h = n // 2
    take_neg = h < n_neg
    pos = mask & ~neg
    # boolean select via algebra (Mosaic rejects i1-payload selects)
    cls = (take_neg & neg) | (~take_neg & pos)
    r0 = jnp.where(take_neg, n_neg - 1 - h, h - n_neg)
    cnt0 = jnp.where(take_neg, n_neg, n - n_neg)

    a = jnp.abs(x)
    keys = jax.lax.bitcast_convert_type(a, jnp.int32)  # sign bit 0

    # common-prefix skip: first differing bit of [kmin, kmax]
    imax = jnp.int32(2147483647)
    kmin = jnp.min(jnp.where(cls, keys, imax), axis=1, keepdims=True)
    kmax = jnp.max(jnp.where(cls, keys, 0), axis=1, keepdims=True)
    diff_bits = kmin ^ kmax
    # floor(log2(u)) via f32 convert; rounding can only overestimate
    # (conservative: starts one digit earlier)
    lg = jax.lax.bitcast_convert_type(
        (diff_bits | 1).astype(jnp.float32), jnp.int32) >> 23
    b_hi = lg - 127  # bit index of first difference (may overestimate)
    shift0 = (b_hi >> 1) << 1  # 2-bit align

    def cond(c):
        shift, r, cnt, pmask, pval = c
        live = (shift >= 0) & (r > 0) & (r < cnt - 1)
        return jnp.any(live)

    def body(c):
        # cand is recomputed from the selected key prefix each trip:
        # Mosaic cannot carry (B, N) i1 vectors through scf.while.
        shift, r, cnt, pmask, pval = c
        live = (shift >= 0) & (r > 0) & (r < cnt - 1)
        sh = jnp.maximum(shift, 0)
        cand = cls & ((keys & pmask) == pval)
        digit = (keys >> sh) & 0x3
        c0 = jnp.sum(jnp.where(cand & (digit == 0), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        c1 = jnp.sum(jnp.where(cand & (digit == 1), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        c2 = jnp.sum(jnp.where(cand & (digit == 2), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        cum1 = c0 + c1
        cum2 = cum1 + c2
        sel = jnp.where(
            r < c0, 0, jnp.where(r < cum1, 1, jnp.where(r < cum2, 2, 3)))
        r_new = r - jnp.where(
            sel == 0, 0, jnp.where(sel == 1, c0,
                                   jnp.where(sel == 2, cum1, cum2)))
        cnt_new = jnp.where(
            sel == 0, c0, jnp.where(sel == 1, c1,
                                    jnp.where(sel == 2, c2,
                                              cnt - cum2)))
        pmask_new = pmask | (3 << sh)
        pval_new = pval | (sel << sh)
        shift_new = shift - 2
        return (jnp.where(live, shift_new, shift),
                jnp.where(live, r_new, r),
                jnp.where(live, cnt_new, cnt),
                jnp.where(live, pmask_new, pmask),
                jnp.where(live, pval_new, pval))

    z = jnp.zeros_like(shift0)
    shift, r, cnt, pmask, pval = jax.lax.while_loop(
        cond, body, (shift0, r0, cnt0, z, z))
    cand = cls & ((keys & pmask) == pval)

    inf = jnp.float32(jnp.inf)
    a_min = jnp.min(jnp.where(cand, a, inf), axis=1, keepdims=True)
    a_max = jnp.max(jnp.where(cand, a, -inf), axis=1, keepdims=True)
    a_v = jnp.where(r <= 0, a_min, a_max)
    v_hi = jnp.where(take_neg, -a_v, a_v)

    less = mask & (x < v_hi)
    cnt_less = jnp.sum(jnp.where(less, one, zero), axis=1,
                       keepdims=True).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -inf), axis=1, keepdims=True)
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


def _median_radix2p_rows(x, mask, n):
    """Static 16-pass 2-bit radix with PACKED counts: c0 and c1 ride one
    f32 sum as c0*4096 + c1 (both < 2^10 at N <= 4095, and every partial
    sum stays integer-exact under the 24-bit mantissa), c2 keeps its own
    sum — 2 lane reductions per pass instead of 3."""
    keys = _order_keys_u32(x)
    h = n // 2
    cand = mask
    r = h
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    pk = jnp.float32(4096.0)
    for p in range(16):
        shift = 30 - 2 * p
        digit = (keys >> shift) & 0x3
        v01 = jnp.where(cand & (digit == 0), pk, zero) + jnp.where(
            cand & (digit == 1), one, zero)
        s01 = jnp.sum(v01, axis=1, keepdims=True).astype(jnp.int32)
        c0 = s01 >> 12
        c1 = s01 & 0xFFF
        c2 = jnp.sum(jnp.where(cand & (digit == 2), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        cum1 = c0 + c1
        cum2 = cum1 + c2
        sel = jnp.where(
            r < c0, 0, jnp.where(r < cum1, 1, jnp.where(r < cum2, 2, 3))
        ).astype(jnp.uint32)
        r = r - jnp.where(
            sel == 0, 0, jnp.where(sel == 1, c0,
                                   jnp.where(sel == 2, cum1, cum2))
        )
        cand = cand & (digit == sel)
    inf = jnp.float32(jnp.inf)
    v_hi = jnp.min(jnp.where(cand, x, inf), axis=1, keepdims=True)
    less = mask & (x < v_hi)
    cnt_less = jnp.sum(jnp.where(less, one, zero), axis=1,
                       keepdims=True).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -inf), axis=1, keepdims=True)
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


VARIANTS = {
    "radix2": _median_radix2_rows,
    "radix1": _median_radix1_rows,
    "bisect": _median_bisect_rows,
    "radix2w": _median_radix2w_rows,
    "radixd": _median_radixd_rows,
    "radix2p": _median_radix2p_rows,
}


def make_kernel(fn, k):
    def kernel(x_ref, m_ref, out_ref):
        x0 = x_ref[:]
        mask = m_ref[:] > 0.5
        n = jnp.sum(jnp.where(mask, 1.0, 0.0), axis=1,
                    keepdims=True).astype(jnp.int32)

        def body(i, c):
            x, acc = c
            med = fn(x, mask, n)
            # perturb like an IRLS step would (keeps values realistic)
            x = x * 1.0001 + 1e-6 * med
            return x, acc + med

        _, acc = jax.lax.fori_loop(0, k, body, (x0, jnp.zeros((B, 1),
                                                              jnp.float32)))
        out_ref[:] = acc

    def run(x, m):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, m)

    return run


def measure(fn, *args):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    # realistic IRLS residuals: mixed-sign, small, with outliers
    x = rng.normal(0.0, 0.003, (B, N)).astype(np.float32)
    out_rows = rng.random((B, N)) < 0.05
    x[out_rows] += rng.normal(0.0, 0.05, out_rows.sum()).astype(np.float32)
    m = (rng.random((B, N)) < 0.9).astype(np.float32)
    xj = jnp.asarray(x)
    mj = jnp.asarray(m)

    # correctness vs numpy (reference even/odd semantics)
    def np_median(row, mask):
        v = np.sort(row[mask > 0.5])
        nn = len(v)
        if nn == 0:
            return 0.0
        hh = nn // 2
        if nn % 2 == 1:
            return v[hh]
        return 0.5 * (np.float32(v[hh - 1]) + np.float32(v[hh]))

    want = np.array([np_median(x[i], m[i]) for i in range(B)],
                    np.float32)
    for name, fn in VARIANTS.items():
        got = np.asarray(make_kernel(fn, 1)(xj, mj)).ravel()
        ok = np.array_equal(got, want)
        print(f"{name:10s} exact={ok}")
        if not ok:
            bad = np.nonzero(got != want)[0][:4]
            print("   mismatch rows", bad, got[bad], want[bad])

    print(f"platform={jax.devices()[0].platform} B={B} N={N}")
    for name, fn in VARIANTS.items():
        t1 = measure(jax.jit(make_kernel(fn, 64)), xj, mj)
        t2 = measure(jax.jit(make_kernel(fn, 4096)), xj, mj)
        per = (t2 - t1) / 4032
        print(f"{name:10s} {per*1e6:9.2f} us/median-call "
              f"(t64={t1*1e3:.2f} t4096={t2*1e3:.2f})")


if __name__ == "__main__":
    main()
