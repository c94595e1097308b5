"""Fused Pallas TPU kernel: one launch per robust SE(2) GN update.

The inner IRLS iteration (reference src/lib.rs:218-261) at the XLA level
costs ~30 small kernels — residuals, two radix-select medians per
dimension, weights, masked einsums — and at 28k points each launch's
latency dwarfs its work.  This kernel does the whole update in ONE
launch, everything VMEM-resident:

  1. residuals r = R s + t - d  (coordinate-major (M, 128) layout)
  2. robust sigma per dim: exact 2-bit radix select for the upper median
     order stat + a count/max pass for the lower (even-length average,
     reference src/stats.rs:18-27), then MAD the same way
  3. Huber IRLS weights u_j = drho(r_j^2, k) / sigma_j, masked
  4. the normal-equation sums.  J = [R | R(-a_y, a_x)^T] shares R across
     all points, so J^T J / J^T r collapse to 10 point-reductions:
       S_u = sum u_j, S_uw = sum u_j w_j, S_uw2 = sum u_j w_j^2,
       S_ur = sum u_j r_j, S_uwr = sum u_j w_j r_j     (per dim j)
     with w_x = -r00 a_y + r01 a_x, w_y = -r10 a_y + r11 a_x; the 3x3
     system is assembled from these scalars on the host side.
  5. the Huber error at the pre-update transform (the inner loop's
     stop-3 value) rides along.

Output: one (1, 16) f32 vector of packed scalars.

Reduction order differs from the XLA einsum path, so results match to
f32 roundoff (not bitwise); the parity suite runs the XLA path, and the
bench gates on ATE.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

try:  # pragma: no cover
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128


def _order_keys_u32(x):
    """Monotone float32 -> uint32 key map shared by every in-kernel radix
    select (flip all bits of negatives, the sign bit of non-negatives)."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    sign = (b >> 31) == 1
    return b ^ jnp.where(sign, jnp.uint32(0xFFFFFFFF),
                         jnp.uint32(0x80000000))


def _masked_sum(x, m):
    return jnp.sum(jnp.where(m, x, 0.0))


def _sum2(x):
    """Two-stage reduce of an (M, 256) f32 array into its two 128-lane
    halves: one shared sublane reduction, then two cheap 128-lane
    reductions.  Mosaic keeps everything 2D (3D layouts are unsupported)."""
    col = jnp.sum(x, axis=0, keepdims=True)  # (1, 256)
    return jnp.sum(col[:, :128]), jnp.sum(col[:, 128:])


def _median_radix2_pair(x0, x1, mask, n):
    """Exact masked medians of TWO (M, 128) f32 arrays at once.

    The two dims sit side by side in a (M, 256) array, so each radix
    pass's digit extraction, comparison and the expensive sublane
    reduction are shared; only the final 128-lane fold and the scalar
    rank bookkeeping are per-dim.  Reference even/odd order-stat
    semantics (src/stats.rs:18-27)."""
    xs = jnp.concatenate([x0, x1], axis=1)  # (M, 256)
    keys = _order_keys_u32(xs)

    h = n // 2  # same target rank for both dims (shared mask)
    mask2 = jnp.concatenate([mask, mask], axis=1)
    cand = mask2
    r0 = h
    r1 = h
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    # 16 passes x 2-bit digits, high to low.
    for p in range(16):
        shift = 30 - 2 * p
        digit = (keys >> shift) & 0x3
        c0a, c0b = _sum2(jnp.where(cand & (digit == 0), one, zero))
        c1a, c1b = _sum2(jnp.where(cand & (digit == 1), one, zero))
        c2a, c2b = _sum2(jnp.where(cand & (digit == 2), one, zero))

        def _advance(r, c0, c1, c2):
            cum0 = c0.astype(jnp.int32)
            cum1 = cum0 + c1.astype(jnp.int32)
            cum2 = cum1 + c2.astype(jnp.int32)
            sel = jnp.where(
                r < cum0, 0,
                jnp.where(r < cum1, 1, jnp.where(r < cum2, 2, 3)),
            ).astype(jnp.uint32)
            r_new = r - jnp.where(
                sel == 0, 0,
                jnp.where(sel == 1, cum0, jnp.where(sel == 2, cum1, cum2)),
            )
            return sel, r_new

        sel0, r0 = _advance(r0, c0a, c1a, c2a)
        sel1, r1 = _advance(r1, c0b, c1b, c2b)
        lane = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
        sel_full = jnp.where(lane < 128, sel0, sel1)
        cand = cand & (digit == sel_full)

    inf = jnp.float32(jnp.inf)
    v_cols = jnp.min(jnp.where(cand, xs, inf), axis=0, keepdims=True)
    v_hi0 = jnp.min(v_cols[:, :128])
    v_hi1 = jnp.min(v_cols[:, 128:])

    # lower order stat via count/max (see ops.select.masked_median_radix)
    lane = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
    v_hi_full = jnp.where(lane < 128, v_hi0, v_hi1)
    less = mask2 & (xs < v_hi_full)
    cl0, cl1 = _sum2(jnp.where(less, one, zero))
    mx_cols = jnp.max(jnp.where(less, xs, -inf), axis=0, keepdims=True)
    vmax0 = jnp.max(mx_cols[:, :128])
    vmax1 = jnp.max(mx_cols[:, 128:])

    def _combine(v_hi, cnt_less, vmax_less):
        v_lo = jnp.where(cnt_less.astype(jnp.int32) == h, vmax_less, v_hi)
        odd = (n % 2) == 1
        med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
        return jnp.where(n > 0, med, 0.0)

    return _combine(v_hi0, cl0, vmax0), _combine(v_hi1, cl1, vmax1)


_MAD_SCALE = 1.482602218505602  # reference src/stats.rs:42


def _gn_stats_core(r00, r01, r10, r11, tx, ty, sx, sy, dx, dy, mask, mf,
                   n, huber_k: float):
    """The per-iteration GN statistics, all VMEM-resident.  Returns the
    10 normal-equation sums, the Huber error, and the per-dim sigmas."""
    rx = r00 * sx + r01 * sy + tx - dx
    ry = r10 * sx + r11 * sy + ty - dy

    k2 = jnp.float32(huber_k * huber_k)

    # robust sigma per dimension: median then MAD (dims paired per pass)
    med_x, med_y = _median_radix2_pair(rx, ry, mask, n)
    mad_x, mad_y = _median_radix2_pair(
        jnp.abs(rx - med_x), jnp.abs(ry - med_y), mask, n
    )
    sig_x = jnp.float32(_MAD_SCALE) * mad_x
    sig_y = jnp.float32(_MAD_SCALE) * mad_y
    g_x = jnp.where(sig_x != 0.0, 1.0 / jnp.where(sig_x != 0.0, sig_x, 1.0),
                    0.0)
    g_y = jnp.where(sig_y != 0.0, 1.0 / jnp.where(sig_y != 0.0, sig_y, 1.0),
                    0.0)

    # IRLS weights: drho(e, k) = 1 if e <= k^2 else k / sqrt(e)
    ex = rx * rx
    ey = ry * ry
    wgt_x = jnp.where(ex <= k2, 1.0, huber_k * jax.lax.rsqrt(ex))
    wgt_y = jnp.where(ey <= k2, 1.0, huber_k * jax.lax.rsqrt(ey))
    u_x = wgt_x * g_x * mf
    u_y = wgt_y * g_y * mf

    # third Jacobian column per point
    w_x = -r00 * sy + r01 * sx
    w_y = -r10 * sy + r11 * sx

    sums = (
        jnp.sum(u_x), jnp.sum(u_x * w_x), jnp.sum(u_x * w_x * w_x),
        jnp.sum(u_x * rx), jnp.sum(u_x * w_x * rx),
        jnp.sum(u_y), jnp.sum(u_y * w_y), jnp.sum(u_y * w_y * w_y),
        jnp.sum(u_y * ry), jnp.sum(u_y * w_y * ry),
    )
    # Huber error at the pre-update transform: rho(|r|^2, k)
    e = ex + ey
    rho = jnp.where(e <= k2, e, 2.0 * huber_k * jnp.sqrt(e) - k2)
    err = jnp.sum(rho * mf)
    return sums, err, sig_x, sig_y


def _gn_kernel(params_ref, sx_ref, sy_ref, dx_ref, dy_ref, m_ref, out_ref,
               *, huber_k: float):
    r00 = params_ref[0, 0]
    r01 = params_ref[0, 1]
    r10 = params_ref[0, 2]
    r11 = params_ref[0, 3]
    tx = params_ref[0, 4]
    ty = params_ref[0, 5]

    sx = sx_ref[:]
    sy = sy_ref[:]
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
    nf = n.astype(jnp.float32)

    sums, err, sig_x, sig_y = _gn_stats_core(
        r00, r01, r10, r11, tx, ty, sx, sy, dx_ref[:], dy_ref[:], mask,
        mf, n, huber_k,
    )
    (s_u_x, s_uw_x, s_uw2_x, s_ur_x, s_uwr_x,
     s_u_y, s_uw_y, s_uw2_y, s_ur_y, s_uwr_y) = sums

    out_ref[0, 0] = s_u_x
    out_ref[0, 1] = s_uw_x
    out_ref[0, 2] = s_uw2_x
    out_ref[0, 3] = s_ur_x
    out_ref[0, 4] = s_uwr_x
    out_ref[0, 5] = s_u_y
    out_ref[0, 6] = s_uw_y
    out_ref[0, 7] = s_uw2_y
    out_ref[0, 8] = s_ur_y
    out_ref[0, 9] = s_uwr_y
    out_ref[0, 10] = err
    out_ref[0, 11] = nf
    out_ref[0, 12] = sig_x
    out_ref[0, 13] = sig_y
    out_ref[0, 14] = 0.0
    out_ref[0, 15] = 0.0


@functools.partial(jax.jit, static_argnames=("huber_k", "interpret"))
def gn_stats_pallas(
    src: Array,
    dst: Array,
    mask: Array,
    rot: Array,
    t: Array,
    huber_k: float,
    interpret: bool = False,
) -> Array:
    """src/dst: (N, 2) with N a multiple of 128; mask: (N,).
    Returns the packed (16,) f32 stats vector (see module docstring)."""
    n = src.shape[0]
    m_rows = n // _LANES
    shape = (m_rows, _LANES)
    sx = src[:, 0].reshape(shape)
    sy = src[:, 1].reshape(shape)
    dx = dst[:, 0].reshape(shape)
    dy = dst[:, 1].reshape(shape)
    mf = mask.astype(jnp.float32).reshape(shape)
    params = jnp.concatenate(
        [rot.reshape(-1), t.reshape(-1), jnp.zeros(2, rot.dtype)]
    ).astype(jnp.float32).reshape(1, 8)

    out = pl.pallas_call(
        functools.partial(_gn_kernel, huber_k=float(huber_k)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        interpret=interpret,
    )(params, sx, sy, dx, dy, mf)
    return out[0]


def assemble_update(stats: Array, rot: Array):
    """Rebuild (jtj (..., 3, 3), jtr (..., 3), err, count, sigma) from the
    kernel's packed stats using J = [R | w], w_x/w_y the per-point third
    column.  Batch-agnostic: stats (..., 16), rot (..., 2, 2).

    J_x^T J_x = [[r00^2, r00 r01, r00 w],[., r01^2, r01 w],[., ., w^2]],
    so sum u (J^T J) needs only S_u, S_uw, S_uw2 per dim; J^T r likewise.
    """
    (s_u_x, s_uw_x, s_uw2_x, s_ur_x, s_uwr_x,
     s_u_y, s_uw_y, s_uw2_y, s_ur_y, s_uwr_y,
     err, nf, sig_x, sig_y) = [stats[..., i] for i in range(14)]
    r00, r01 = rot[..., 0, 0], rot[..., 0, 1]
    r10, r11 = rot[..., 1, 0], rot[..., 1, 1]

    def dim_terms(a, b, s_u, s_uw, s_uw2, s_ur, s_uwr):
        jtj = jnp.stack([
            jnp.stack([a * a * s_u, a * b * s_u, a * s_uw], axis=-1),
            jnp.stack([a * b * s_u, b * b * s_u, b * s_uw], axis=-1),
            jnp.stack([a * s_uw, b * s_uw, s_uw2], axis=-1),
        ], axis=-2)
        jtr = jnp.stack([a * s_ur, b * s_ur, s_uwr], axis=-1)
        return jtj, jtr

    jtj_x, jtr_x = dim_terms(r00, r01, s_u_x, s_uw_x, s_uw2_x, s_ur_x,
                             s_uwr_x)
    jtj_y, jtr_y = dim_terms(r10, r11, s_u_y, s_uw_y, s_uw2_y, s_ur_y,
                             s_uwr_y)
    return jtj_x + jtj_y, jtr_x + jtr_y, err, nf, sig_x, sig_y


# ---------------------------------------------------------------------------
# Pair-vectorized batched GN kernel: B pairs x N points in ONE launch.
#
# The vmapped single-pair kernel turns the batch into a grid dimension, so
# its 32 sequential radix-reduction rounds repeat per pair.  Here pairs sit
# along SUBLANES and points along LANES: every radix pass's digit compare,
# candidate mask, and per-pair lane-reduction run for ALL pairs at once,
# and the scalar rank bookkeeping becomes (B,) vector math.  Right shape
# for many small pairs (B ~ 10^2-10^3, N ~ 10^2-10^3 lanes); the
# single-pair kernel remains the choice for one huge cloud.
# ---------------------------------------------------------------------------


def _median_radix2_rows(x, mask, n):
    """Exact masked median PER ROW of x ((B, N) f32) — reference even/odd
    semantics.  n: (B, 1) int32 valid counts.  Returns (B, 1)."""
    keys = _order_keys_u32(x)

    h = n // 2  # (B, 1)
    cand = mask
    r = h
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for p in range(16):
        shift = 30 - 2 * p
        digit = (keys >> shift) & 0x3
        c0 = jnp.sum(jnp.where(cand & (digit == 0), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        c1 = jnp.sum(jnp.where(cand & (digit == 1), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        c2 = jnp.sum(jnp.where(cand & (digit == 2), one, zero), axis=1,
                     keepdims=True).astype(jnp.int32)
        cum1 = c0 + c1
        cum2 = cum1 + c2
        sel = jnp.where(
            r < c0, 0, jnp.where(r < cum1, 1, jnp.where(r < cum2, 2, 3))
        ).astype(jnp.uint32)  # (B, 1)
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


def _median_radixd_rows(x, mask, n):
    """Exact masked median PER ROW — dynamic-exit sign-split radix select.

    Bit-identical outputs to _median_radix2_rows (both return exact
    order statistics with the reference even/odd semantics); ~25% fewer
    cycles on IRLS-shaped rows (device: 4.9 vs 6.4 us/call at (128, 768),
    benchmarks/profile_median.py).  Three tricks vs the static 16-pass
    radix:

    - Sign split: the h-th smallest SIGNED value lives in one sign class
      (negatives hold ranks 0..n_neg-1 in DESCENDING |x|), and nonneg
      f32 bit patterns are order-isomorphic int32 keys — all digit math
      runs on |x| bits in plain int32 (Mosaic has no unsigned reduce).
    - Common-prefix skip: the first 2-bit digit examined starts at the
      highest differing bit of [kmin, kmax] over the class — clustered
      residual keys share exponent bits, skipping ~2-6 leading passes.
    - Rank pinning: a lax.while_loop exits a row once its rank hits an
      endpoint of the candidate set (r == 0 -> min over candidates,
      r == cnt-1 -> max); candidates shrink ~4x per pass, so typical
      depth is ~5-7 passes, not 16.  The candidate mask is recomputed
      from the selected key prefix each trip (Mosaic cannot carry
      (B, N) i1 vectors through scf.while).
    """
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
    # floor(log2(u)) via the f32 exponent; convert rounding can only
    # OVERestimate (starts one digit earlier — conservative)
    lg = jax.lax.bitcast_convert_type(
        (diff_bits | 1).astype(jnp.float32), jnp.int32) >> 23
    b_hi = lg - 127
    shift0 = (b_hi >> 1) << 1  # 2-bit align

    def cond(c):
        shift, r, cnt, pmask, pval = c
        live = (shift >= 0) & (r > 0) & (r < cnt - 1)
        return jnp.any(live)

    def body(c):
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
                                    jnp.where(sel == 2, c2, cnt - cum2)))
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
    # r <= 0: rank pinned to the candidates' min |x|; r == cnt-1 (or the
    # prefix exhausted: all candidate keys equal): the max.  In the
    # negative class |x| order REVERSES the value order, so min/max swap
    # under the sign restore below.
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


def _gn_batched_kernel(params_ref, sx_ref, sy_ref, dx_ref, dy_ref, m_ref,
                       out_ref, *, huber_k: float):
    """params_ref: (B, 8) [r00 r01 r10 r11 tx ty 0 0]; point arrays (B, N);
    out_ref: (B, 16) packed per-pair stats (same layout as _gn_kernel)."""
    r00 = params_ref[:, 0:1]
    r01 = params_ref[:, 1:2]
    r10 = params_ref[:, 2:3]
    r11 = params_ref[:, 3:4]
    tx = params_ref[:, 4:5]
    ty = params_ref[:, 5:6]

    sx = sx_ref[:]
    sy = sy_ref[:]
    mask = m_ref[:] > 0.5  # (B, N)
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(mf, axis=1, keepdims=True).astype(jnp.int32)  # (B, 1)

    rx = r00 * sx + r01 * sy + tx - dx_ref[:]
    ry = r10 * sx + r11 * sy + ty - dy_ref[:]

    # Both dims share each radix pass: x rows stacked above y rows, so
    # one (2B, N) rows-select covers med_x and med_y (same for MAD).
    mask2 = jnp.concatenate([mask, mask], axis=0)
    n2 = jnp.concatenate([n, n], axis=0)
    bsz = rx.shape[0]
    med = _median_radix2_rows(
        jnp.concatenate([rx, ry], axis=0), mask2, n2)
    med_x, med_y = med[:bsz], med[bsz:]
    mad = _median_radix2_rows(
        jnp.concatenate([jnp.abs(rx - med_x), jnp.abs(ry - med_y)],
                        axis=0), mask2, n2)
    mad_x, mad_y = mad[:bsz], mad[bsz:]
    sig_x = jnp.float32(_MAD_SCALE) * mad_x  # (B, 1)
    sig_y = jnp.float32(_MAD_SCALE) * mad_y
    g_x = jnp.where(sig_x != 0.0, 1.0 / jnp.where(sig_x != 0.0, sig_x, 1.0),
                    0.0)
    g_y = jnp.where(sig_y != 0.0, 1.0 / jnp.where(sig_y != 0.0, sig_y, 1.0),
                    0.0)

    k2 = jnp.float32(huber_k * huber_k)
    hk = jnp.float32(huber_k)
    ex = rx * rx
    ey = ry * ry
    u_x = jnp.where(ex <= k2, 1.0, hk * jax.lax.rsqrt(ex)) * g_x * mf
    u_y = jnp.where(ey <= k2, 1.0, hk * jax.lax.rsqrt(ey)) * g_y * mf
    w_x = -r00 * sy + r01 * sx
    w_y = -r10 * sy + r11 * sx

    def rsum(v):
        return jnp.sum(v, axis=1)  # (B,)

    out_ref[:, 0] = rsum(u_x)
    out_ref[:, 1] = rsum(u_x * w_x)
    out_ref[:, 2] = rsum(u_x * w_x * w_x)
    out_ref[:, 3] = rsum(u_x * rx)
    out_ref[:, 4] = rsum(u_x * w_x * rx)
    out_ref[:, 5] = rsum(u_y)
    out_ref[:, 6] = rsum(u_y * w_y)
    out_ref[:, 7] = rsum(u_y * w_y * w_y)
    out_ref[:, 8] = rsum(u_y * ry)
    out_ref[:, 9] = rsum(u_y * w_y * ry)
    e = ex + ey
    out_ref[:, 10] = rsum(
        jnp.where(e <= k2, e, 2.0 * hk * jnp.sqrt(e) - k2) * mf)
    out_ref[:, 11] = n[:, 0].astype(jnp.float32)
    out_ref[:, 12] = sig_x[:, 0]
    out_ref[:, 13] = sig_y[:, 0]
    out_ref[:, 14] = jnp.zeros_like(sig_x[:, 0])
    out_ref[:, 15] = jnp.zeros_like(sig_x[:, 0])


@functools.partial(jax.jit, static_argnames=("huber_k", "interpret"))
def gn_stats_pallas_batched(
    src: Array,
    dst: Array,
    mask: Array,
    rot: Array,
    t: Array,
    huber_k: float,
    interpret: bool = False,
) -> Array:
    """src/dst: (B, N, 2) with N a multiple of 128; mask: (B, N);
    rot: (B, 2, 2); t: (B, 2).  Returns (B, 16) packed stats."""
    b, n, _ = src.shape
    # Pad the pair axis to a sublane multiple: the in-kernel x|y row
    # stacking concatenates at offset B, which Mosaic rejects when
    # misaligned ("invalid vector register cast").  Padded rows carry
    # zero masks -> zero stats.
    b_pad = -(-b // 8) * 8
    if b_pad != b:
        pad = [(0, b_pad - b)]
        src = jnp.pad(src, pad + [(0, 0), (0, 0)])
        dst = jnp.pad(dst, pad + [(0, 0), (0, 0)])
        mask = jnp.pad(mask, pad + [(0, 0)])
        rot = jnp.pad(rot, pad + [(0, 0), (0, 0)])
        t = jnp.pad(t, pad + [(0, 0)])
    bp = src.shape[0]
    sx = src[..., 0]
    sy = src[..., 1]
    dx = dst[..., 0]
    dy = dst[..., 1]
    mf = mask.astype(jnp.float32)
    params = jnp.concatenate(
        [rot.reshape(bp, 4), t.reshape(bp, 2),
         jnp.zeros((bp, 2), rot.dtype)], axis=1,
    ).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_gn_batched_kernel, huber_k=float(huber_k)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, 16), jnp.float32),
        interpret=interpret,
    )(params, sx, sy, dx, dy, mf)
    return out[:b]


# ---------------------------------------------------------------------------
# The ENTIRE inner IRLS loop in one kernel launch.
#
# On iteration-heavy workloads (real mm-scale 2D scans run ~10-200 inner
# iterations) the per-iteration cost is dominated by ~30 us of
# inter-kernel gaps around the per-iteration launch; looping INSIDE the
# kernel with scalar carries (rot, t, prev_err) removes all of it.  The
# 3x3 solve (adjugate, same det gating as ops.linalg.inverse3x3) and the
# SE(2) exponential (same small-angle Taylor branch as geometry.se2)
# happen in-kernel; the three stop conditions replicate
# align2d.estimate_transform's exact ordering.
# ---------------------------------------------------------------------------

_SMALL_ANGLE_F32 = float(jnp.finfo(jnp.float32).eps) ** 0.25


def _irls_loop(sx, sy, dx, dy, mask, mf, n, *, huber_k: float,
               det_rel_eps: float, tol_d2: float, max_iter: int,
               point_scale: float):
    """The fixed-correspondence IRLS while_loop on in-kernel values.

    Shared verbatim by :func:`_inner_loop_kernel` (one launch per
    estimate_transform call) and the whole-frame ICP kernel
    (:func:`_icp2d_frame_kernel`), so both run the identical op
    sequence.  Returns (r00, r01, r10, r11, tx, ty, it) starting from
    identity — estimate_transform's exact stop-condition ordering
    (reference src/lib.rs:59-84)."""
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def cond(c):
        it, done = c[6], c[7]
        return (it < max_iter) & (done == 0)

    def body(c):
        r00, r01, r10, r11, tx, ty, it, done, prev_err = c
        sums, err, sig_x, sig_y = _gn_stats_core(
            r00, r01, r10, r11, tx, ty, sx, sy, dx, dy, mask, mf, n,
            huber_k,
        )
        (s_u_x, s_uw_x, s_uw2_x, s_ur_x, s_uwr_x,
         s_u_y, s_uw_y, s_uw2_y, s_ur_y, s_uwr_y) = sums

        # assemble the symmetric 3x3 normal equations (docs/jacobian.md)
        h00 = r00 * r00 * s_u_x + r10 * r10 * s_u_y
        h01 = r00 * r01 * s_u_x + r10 * r11 * s_u_y
        h02 = r00 * s_uw_x + r10 * s_uw_y
        h11 = r01 * r01 * s_u_x + r11 * r11 * s_u_y
        h12 = r01 * s_uw_x + r11 * s_uw_y
        h22 = s_uw2_x + s_uw2_y
        b0 = r00 * s_ur_x + r10 * s_ur_y
        b1 = r01 * s_ur_x + r11 * s_ur_y
        b2 = s_uwr_x + s_uwr_y

        det = (h00 * (h11 * h22 - h12 * h12)
               - h01 * (h01 * h22 - h12 * h02)
               + h02 * (h01 * h12 - h11 * h02))
        if det_rel_eps > 0.0:
            mx = jnp.maximum(
                jnp.maximum(jnp.abs(h00), jnp.abs(h01)),
                jnp.maximum(
                    jnp.maximum(jnp.abs(h02), jnp.abs(h11)),
                    jnp.maximum(jnp.abs(h12), jnp.abs(h22)),
                ),
            )
            ok = jnp.abs(det) > jnp.float32(det_rel_eps) * mx * mx * mx
        else:
            ok = det != 0.0
        ok = ok & (n >= 2)
        safe_det = jnp.where(ok, det, one)
        # adjugate solve: delta = -(H^-1 b)
        a00 = h11 * h22 - h12 * h12
        a01 = h02 * h12 - h01 * h22
        a02 = h01 * h12 - h02 * h11
        a11 = h00 * h22 - h02 * h02
        a12 = h01 * h02 - h00 * h12
        a22 = h00 * h11 - h01 * h01
        d0 = -(a00 * b0 + a01 * b1 + a02 * b2) / safe_det
        d1 = -(a01 * b0 + a11 * b1 + a12 * b2) / safe_det
        d2 = -(a02 * b0 + a12 * b1 + a22 * b2) / safe_det
        d0 = jnp.where(ok, d0, zero)
        d1 = jnp.where(ok, d1, zero)
        d2 = jnp.where(ok, d2, zero)

        # stop conditions, in estimate_transform's exact order
        stop = ~ok
        scale = jnp.float32(point_scale)
        d2_phys = (d0 * scale) ** 2 + (d1 * scale) ** 2 + d2 * d2
        stop = stop | (d2_phys < jnp.float32(tol_d2))
        stop = stop | (err > prev_err)

        # SE(2) exp of the twist, small-angle branch matching geometry.se2
        th = d2
        small = jnp.abs(th) < jnp.float32(_SMALL_ANGLE_F32)
        safe_th = jnp.where(small, one, th)
        t2 = th * th
        av = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe_th) / safe_th)
        bv = jnp.where(small, th / 2.0 - t2 * th / 24.0,
                       (1.0 - jnp.cos(safe_th)) / safe_th)
        tdx = av * d0 - bv * d1
        tdy = bv * d0 + av * d1
        cth = jnp.cos(th)
        sth = jnp.sin(th)
        # T <- Exp(delta) o T  (left-compose)
        n00 = cth * r00 - sth * r10
        n01 = cth * r01 - sth * r11
        n10 = sth * r00 + cth * r10
        n11 = sth * r01 + cth * r11
        ntx = cth * tx - sth * ty + tdx
        nty = sth * tx + cth * ty + tdy

        keep = stop  # a stopping iteration discards its delta
        r00n = jnp.where(keep, r00, n00)
        r01n = jnp.where(keep, r01, n01)
        r10n = jnp.where(keep, r10, n10)
        r11n = jnp.where(keep, r11, n11)
        txn = jnp.where(keep, tx, ntx)
        tyn = jnp.where(keep, ty, nty)
        prev_n = jnp.where(keep, prev_err, err)
        return (r00n, r01n, r10n, r11n, txn, tyn, it + 1,
                jnp.where(stop, 1, 0), prev_n)

    init = (one, zero, zero, one, zero, zero, 0, 0,
            jnp.float32(jnp.finfo(jnp.float32).max))
    r00, r01, r10, r11, tx, ty, it, done, _ = jax.lax.while_loop(
        cond, body, init
    )
    return r00, r01, r10, r11, tx, ty, it


def _inner_loop_kernel(sx_ref, sy_ref, dx_ref, dy_ref, m_ref, out_ref, *,
                       huber_k: float, det_rel_eps: float, tol_d2: float,
                       max_iter: int, point_scale: float):
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
    r00, r01, r10, r11, tx, ty, it = _irls_loop(
        sx_ref[:], sy_ref[:], dx_ref[:], dy_ref[:], mask, mf, n,
        huber_k=huber_k, det_rel_eps=det_rel_eps, tol_d2=tol_d2,
        max_iter=max_iter, point_scale=point_scale,
    )
    out_ref[0, 0] = r00
    out_ref[0, 1] = r01
    out_ref[0, 2] = r10
    out_ref[0, 3] = r11
    out_ref[0, 4] = tx
    out_ref[0, 5] = ty
    out_ref[0, 6] = it.astype(jnp.float32)
    out_ref[0, 7] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("huber_k", "det_rel_eps", "tol_d2", "max_iter",
                     "point_scale", "interpret"),
)
def estimate_transform_pallas(
    src: Array,
    dst: Array,
    mask: Array,
    huber_k: float,
    det_rel_eps: float,
    tol_d2: float,
    max_iter: int,
    point_scale: float,
    interpret: bool = False,
):
    """The whole fixed-correspondence IRLS loop in ONE kernel launch.

    src/dst: (N, 2), N a multiple of 128; mask: (N,).  Returns
    (rot (2, 2), t (2,)) in solver units, starting from identity —
    exactly align2d.estimate_transform's semantics at f32 roundoff.
    """
    n = src.shape[0]
    shape = (n // _LANES, _LANES)
    sx = src[:, 0].reshape(shape)
    sy = src[:, 1].reshape(shape)
    dx = dst[:, 0].reshape(shape)
    dy = dst[:, 1].reshape(shape)
    mf = mask.astype(jnp.float32).reshape(shape)

    out = pl.pallas_call(
        functools.partial(
            _inner_loop_kernel, huber_k=float(huber_k),
            det_rel_eps=float(det_rel_eps), tol_d2=float(tol_d2),
            max_iter=int(max_iter), point_scale=float(point_scale),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(sx, sy, dx, dy, mf)
    rot = jnp.stack([
        jnp.stack([out[0, 0], out[0, 1]]),
        jnp.stack([out[0, 2], out[0, 3]]),
    ])
    t = jnp.stack([out[0, 4], out[0, 5]])
    return rot, t


# ---------------------------------------------------------------------------
# The ENTIRE 2D ICP frame in one kernel launch.
#
# At 2D scan sizes (the reference's scans/2d dataset: 411-670 points) the
# per-frame device work is microseconds — 670^2 exact-NN distances are
# ~0.06 MFLOP-scale — so the fused per-frame cost is dominated by per-op
# and per-launch overhead: each outer iteration pays one NN launch, one
# inner-loop launch and ~15 XLA glue ops (apply_points, prune-bound
# arithmetic that the unpruned small-scan path cannot even use, compose,
# fixed-point test), all inside the sequence runners' lax.scan.  This
# kernel runs the reference's whole Icp2d::estimate (src/lib.rs:105-130)
# per launch: an outer while_loop carrying the transform as 6 scalars,
# each iteration transforming src in-registers, sweeping the exact 1-NN
# (db in a (M, 1) column layout so every query chunk is one broadcasted
# (M, 128) distance block — queries ride lanes, db rows ride sublanes,
# and the per-lane argmin is a cheap sublane reduction), then the
# identical _irls_loop as estimate_transform_pallas, a scalar left-
# compose, and the drivers' bit-exact dT == identity fixed-point exit.
#
# Exactness: the NN is the same strict-min / lowest-index tie-break as
# every other kernel (here over the UNSORTED dst order — no pruning means
# no spatial sort, which matches the reference's tie order directly);
# masked db points carry the usual huge sentinel so they never win.
# Results differ from the unfused pallas path at f32 roundoff only (the
# in-kernel transform is mul-add rather than the XLA einsum).
# VMEM: the (M, 128) distance block caps db size — the driver gates this
# path to small scans (icp2d), where it is the entire point.
# ---------------------------------------------------------------------------

_NN_SENTINEL = 3e19  # matches ops/nn_pallas._SENTINEL


def _icp_outer_loop(t0, sx, sy, mask, mf, n, dxv, dyv, *, huber_k: float,
                    det_rel_eps: float, tol_d2: float,
                    inner_max_iter: int, outer_iters: int,
                    point_scale: float, n_qc: int):
    """Icp2d::estimate as in-kernel values: outer while_loop carrying the
    transform as 6 scalars, exact in-register 1-NN, the shared
    :func:`_irls_loop`, scalar left-compose, bit-exact fixed-point exit.
    ``t0``: 6 warm-start scalars; sx/sy/mf: (C, 128) query layout (rows
    past n_qc must be masked); dxv/dyv: (M, 1) sentinel-masked db
    columns.  Returns the 6 transform scalars + the outer count."""
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    row = jax.lax.broadcasted_iota(jnp.int32, sx.shape, 0)

    def cond(c):
        it, done = c[6], c[7]
        return (it < outer_iters) & (done == 0)

    def body(c):
        r00, r01, r10, r11, tx, ty, it, done = c
        # T(src), in the query layout (reference src/lib.rs:113-116).
        stx = r00 * sx + r01 * sy + tx
        sty = r10 * sx + r11 * sy + ty
        # Exact 1-NN per query chunk: one (M, 128) block per chunk,
        # statically unrolled (n_qc is tiny).  Deferred-argmin epilogue
        # per block; matched coordinates extracted via the winner's
        # one-hot (no gather).
        mdx = jnp.zeros_like(sx)
        mdy = jnp.zeros_like(sy)
        for i in range(n_qc):
            diffx = stx[i:i + 1, :] - dxv      # (M, 128)
            diffy = sty[i:i + 1, :] - dyv
            dist = diffx * diffx + diffy * diffy
            bd = jnp.min(dist, axis=0, keepdims=True)      # (1, 128)
            iota_m = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 0)
            cand = jnp.where(dist == bd, iota_m, big)
            win = jnp.min(cand, axis=0, keepdims=True)     # lowest index
            oh = cand == win
            mxr = jnp.sum(jnp.where(oh, dxv + jnp.zeros_like(dist), 0.0),
                          axis=0, keepdims=True)
            myr = jnp.sum(jnp.where(oh, dyv + jnp.zeros_like(dist), 0.0),
                          axis=0, keepdims=True)
            sel = row == i
            mdx = jnp.where(sel, mxr, mdx)
            mdy = jnp.where(sel, myr, mdy)
        # estimate_transform on (transformed src, matched dst) — the
        # identical op sequence as the one-launch inner-loop kernel.
        d00, d01, d10, d11, dtx, dty, _ = _irls_loop(
            stx, sty, mdx, mdy, mask, mf, n, huber_k=huber_k,
            det_rel_eps=det_rel_eps, tol_d2=tol_d2,
            max_iter=inner_max_iter, point_scale=point_scale,
        )
        # Bit-exact fixed point (models.icp2d._outer_fixed_point): an
        # identity dT reproduces itself forever, so exit is exact.
        isid = ((d00 == 1.0) & (d01 == 0.0) & (d10 == 0.0)
                & (d11 == 1.0) & (dtx == 0.0) & (dty == 0.0))
        # T <- dT o T (left-compose).
        n00 = d00 * r00 + d01 * r10
        n01 = d00 * r01 + d01 * r11
        n10 = d10 * r00 + d11 * r10
        n11 = d10 * r01 + d11 * r11
        ntx = d00 * tx + d01 * ty + dtx
        nty = d10 * tx + d11 * ty + dty
        return (n00, n01, n10, n11, ntx, nty, it + 1,
                jnp.where(isid, 1, 0))

    init = t0 + (0, 0)
    r00, r01, r10, r11, tx, ty, it, _ = jax.lax.while_loop(
        cond, body, init
    )
    return r00, r01, r10, r11, tx, ty, it


def _icp2d_frame_kernel(params_ref, sx_ref, sy_ref, m_ref, dxc_ref,
                        dyc_ref, out_ref, **kw):
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
    t0 = (params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
          params_ref[0, 3], params_ref[0, 4], params_ref[0, 5])
    r00, r01, r10, r11, tx, ty, it = _icp_outer_loop(
        t0, sx_ref[:], sy_ref[:], mask, mf, n, dxc_ref[:], dyc_ref[:],
        **kw,
    )
    out_ref[0, 0] = r00
    out_ref[0, 1] = r01
    out_ref[0, 2] = r10
    out_ref[0, 3] = r11
    out_ref[0, 4] = tx
    out_ref[0, 5] = ty
    out_ref[0, 6] = it.astype(jnp.float32)
    out_ref[0, 7] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("huber_k", "det_rel_eps", "tol_d2", "inner_max_iter",
                     "outer_iters", "point_scale", "interpret"),
)
def icp2d_frame_pallas(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    rot0: Array,
    t0: Array,
    huber_k: float,
    det_rel_eps: float,
    tol_d2: float,
    inner_max_iter: int,
    outer_iters: int,
    point_scale: float,
    interpret: bool = False,
):
    """The whole warm-started 2D ICP call in ONE kernel launch.

    src: (N, 2), dst: (M, 2) in solver units; masks over the point axes;
    (rot0, t0) the warm-start transform.  Returns (rot, t, outer_iters) —
    Icp2d::estimate semantics (src/lib.rs:105-130) with the bit-exact
    fixed-point early exit, at f32 roundoff of the unfused pallas path.
    """
    n, m = src.shape[0], dst.shape[0]
    n_pad = -(-n // _LANES) * _LANES
    m_pad = -(-m // _LANES) * _LANES
    src = jnp.pad(src, ((0, n_pad - n), (0, 0)))
    sm = jnp.pad(src_mask.astype(jnp.float32), (0, n_pad - n))
    sentinel = jnp.asarray(_NN_SENTINEL, dst.dtype)
    dstm = jnp.where(dst_mask[:, None], dst, sentinel)
    dstm = jnp.pad(dstm, ((0, m_pad - m), (0, 0)),
                   constant_values=_NN_SENTINEL)

    n_qc = n_pad // _LANES
    shape = (n_qc, _LANES)
    sx = src[:, 0].reshape(shape)
    sy = src[:, 1].reshape(shape)
    mf = sm.reshape(shape)
    dxc = dstm[:, 0:1]
    dyc = dstm[:, 1:2]
    params = jnp.concatenate(
        [rot0.reshape(-1), t0.reshape(-1), jnp.zeros(2, rot0.dtype)]
    ).astype(jnp.float32).reshape(1, 8)

    out = pl.pallas_call(
        functools.partial(
            _icp2d_frame_kernel, huber_k=float(huber_k),
            det_rel_eps=float(det_rel_eps), tol_d2=float(tol_d2),
            inner_max_iter=int(inner_max_iter),
            outer_iters=int(outer_iters),
            point_scale=float(point_scale), n_qc=n_qc,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        interpret=interpret,
    )(params, sx, sy, mf, dxc, dyc)
    rot = jnp.stack([
        jnp.stack([out[0, 0], out[0, 1]]),
        jnp.stack([out[0, 2], out[0, 3]]),
    ])
    t = jnp.stack([out[0, 4], out[0, 5]])
    return rot, t, out[0, 6].astype(jnp.int32)


def _icp2d_frame_pairs_kernel(params_ref, sx_ref, sy_ref, m_ref, dxc_ref,
                              dyc_ref, out_ref, **kw):
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
    t0 = (params_ref[0, 0], params_ref[0, 1], params_ref[0, 2],
          params_ref[0, 3], params_ref[0, 4], params_ref[0, 5])
    r00, r01, r10, r11, tx, ty, it = _icp_outer_loop(
        t0, sx_ref[:], sy_ref[:], mask, mf, n, dxc_ref[:], dyc_ref[:],
        **kw,
    )
    out_ref[0, 0] = r00
    out_ref[0, 1] = r01
    out_ref[0, 2] = r10
    out_ref[0, 3] = r11
    out_ref[0, 4] = tx
    out_ref[0, 5] = ty
    out_ref[0, 6] = it.astype(jnp.float32)
    out_ref[0, 7] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("huber_k", "det_rel_eps", "tol_d2", "inner_max_iter",
                     "outer_iters", "point_scale", "interpret"),
)
def icp2d_frame_pallas_pairs(
    src: Array,
    dst: Array,
    src_mask: Array,
    dst_mask: Array,
    rot0: Array,
    t0: Array,
    huber_k: float,
    det_rel_eps: float,
    tol_d2: float,
    inner_max_iter: int,
    outer_iters: int,
    point_scale: float,
    interpret: bool = False,
):
    """A BATCH of whole warm-started 2D ICP calls, one pair per grid step.

    src/dst: (B, N, 2) / (B, M, 2) in solver units; rot0 (B, 2, 2),
    t0 (B, 2).  Returns (rot (B, 2, 2), t (B, 2), outer_iters (B,)).

    Per-pair semantics are IDENTICAL to :func:`icp2d_frame_pallas`
    (pairs are independent), but unlike the per-iteration lockstep
    driver each pair runs its OWN outer loop to ITS bit-exact fixed
    point — outer-loop desynchronization at pair granularity, with the
    exact 1-NN fused in-kernel.  The per-outer pairs-NN + batched-IRLS
    launch pipeline this replaces measured ~1.9 + ~1.1 ms per LOCKSTEP
    outer at 209x768 (docs/DESIGN.md round-3 batched budget); here a
    converged pair costs nothing and there are no inter-phase launches.
    """
    b, nq, _ = src.shape
    m = dst.shape[1]
    n_pad = -(-nq // _LANES) * _LANES
    m_pad = -(-m // _LANES) * _LANES
    n_qc = n_pad // _LANES
    # query layout rows per pair, padded to the 8-sublane block unit
    n_rows = -(-n_qc // 8) * 8

    src = jnp.pad(src, ((0, 0), (0, n_pad - nq), (0, 0)))
    sm = jnp.pad(src_mask.astype(jnp.float32), ((0, 0), (0, n_pad - nq)))
    sentinel = jnp.asarray(_NN_SENTINEL, dst.dtype)
    dstm = jnp.where(dst_mask[..., None], dst, sentinel)
    dstm = jnp.pad(dstm, ((0, 0), (0, m_pad - m), (0, 0)),
                   constant_values=_NN_SENTINEL)

    def rows(v):  # (B, n_pad) -> (B * n_rows, 128), zero row padding
        v = v.reshape(b, n_qc, _LANES)
        v = jnp.pad(v, ((0, 0), (0, n_rows - n_qc), (0, 0)))
        return v.reshape(b * n_rows, _LANES)

    sx = rows(src[..., 0])
    sy = rows(src[..., 1])
    mf = rows(sm)
    dxc = dstm[..., 0].reshape(b * m_pad, 1)
    dyc = dstm[..., 1].reshape(b * m_pad, 1)
    # SMEM blocks need 8-row granularity (compiled-Mosaic block rule):
    # one 8x8 SMEM tile per pair, row 0 carrying the 6 transform scalars.
    params = jnp.concatenate(
        [rot0.reshape(b, 4), t0.reshape(b, 2),
         jnp.zeros((b, 2), rot0.dtype)], axis=-1
    ).astype(jnp.float32)
    params = jnp.pad(params[:, None, :], ((0, 0), (0, 7), (0, 0)))
    params = params.reshape(b * 8, 8)

    out = pl.pallas_call(
        functools.partial(
            _icp2d_frame_pairs_kernel, huber_k=float(huber_k),
            det_rel_eps=float(det_rel_eps), tol_d2=float(tol_d2),
            inner_max_iter=int(inner_max_iter),
            outer_iters=int(outer_iters),
            point_scale=float(point_scale), n_qc=n_qc,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((8, 8), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((n_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_rows, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 8), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b * 8, 8), jnp.float32),
        interpret=interpret,
    )(params, sx, sy, mf, dxc, dyc)
    out = out.reshape(b, 8, 8)[:, 0, :]
    rot = jnp.stack([
        jnp.stack([out[:, 0], out[:, 1]], axis=-1),
        jnp.stack([out[:, 2], out[:, 3]], axis=-1),
    ], axis=-2)
    t = out[:, 4:6]
    return rot, t, out[:, 6].astype(jnp.int32)


# ---------------------------------------------------------------------------
# The entire inner IRLS loop for a BLOCK of pairs per grid step.
#
# The lockstep batched loop (gn_stats_pallas_batched called per iteration)
# pays the slowest pair's iteration count for every pair PLUS ~20 us of
# per-iteration launch/bookkeeping: at 209 real scan pairs that measured
# ~38 max iterations per outer ICP pass against a p90 of ~10.  Here the
# grid walks _PAIR_BLK-pair blocks (_PAIR_BLK = 64: full sublane groups —
# a single pair would fill a fraction of a vreg, wasting issue slots; see
# the cost model at _PAIR_BLK) and each block loops IN-KERNEL only until ITS pairs
# are done.  Consecutive scan pairs converge similarly, so blocks are
# homogeneous and the batch desynchronizes at block granularity with no
# per-iteration launches at all.  Per-pair semantics are IDENTICAL to the
# lockstep loop (rows are independent; a done pair's carry freezes).
# ---------------------------------------------------------------------------

_PAIR_BLK = 64  # per-iteration cost ~ a + b*B with a ~ 5us fixed issue
                # overhead: 8-pair blocks waste issue slots (+3% only),
                # 209 lockstep pays the global max iters; measured on the
                # 209x768 bench: B=32 -> 3251 pairs/s, B=64 -> 3454.


def _inner_loop_batched_kernel(sx_ref, sy_ref, dx_ref, dy_ref, m_ref,
                               out_ref, *, huber_k: float,
                               det_rel_eps: float, tol_d2: float,
                               max_iter: int, point_scale: float):
    sx = sx_ref[:]  # (_PAIR_BLK, N)
    sy = sy_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n = jnp.sum(mf, axis=1, keepdims=True).astype(jnp.int32)  # (_PAIR_BLK, 1)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    k2 = jnp.float32(huber_k * huber_k)
    hk = jnp.float32(huber_k)
    blk = _PAIR_BLK

    def cond(c):
        it, done = c[6], c[7]
        return (it < max_iter) & jnp.any(done == 0)

    def body(c):
        r00, r01, r10, r11, tx, ty, it, done, prev = c  # (_PAIR_BLK,1) each
        rx = r00 * sx + r01 * sy + tx - dx  # (_PAIR_BLK, N)
        ry = r10 * sx + r11 * sy + ty - dy
        mask2 = jnp.concatenate([mask, mask], axis=0)
        n2 = jnp.concatenate([n, n], axis=0)
        # NOTE anti-result (round 3): _median_radixd_rows (dynamic-exit
        # select, 4.9 vs 6.4 us/call isolated) made THIS loop 25% slower
        # (2.87 -> 3.59 ms/outer chain-differenced) — a dynamic while
        # nested inside the IRLS while defeats Mosaic's pipelining of
        # the surrounding vector ops.  Keep the medians static here.
        med = _median_radix2_rows(
            jnp.concatenate([rx, ry], axis=0), mask2, n2)
        med_x, med_y = med[:blk], med[blk:]
        mad = _median_radix2_rows(
            jnp.concatenate([jnp.abs(rx - med_x), jnp.abs(ry - med_y)],
                            axis=0), mask2, n2)
        sig_x = jnp.float32(_MAD_SCALE) * mad[:blk]
        sig_y = jnp.float32(_MAD_SCALE) * mad[blk:]
        g_x = jnp.where(sig_x != 0.0,
                        1.0 / jnp.where(sig_x != 0.0, sig_x, one), zero)
        g_y = jnp.where(sig_y != 0.0,
                        1.0 / jnp.where(sig_y != 0.0, sig_y, one), zero)

        ex = rx * rx
        ey = ry * ry
        u_x = jnp.where(ex <= k2, 1.0, hk * jax.lax.rsqrt(ex)) * g_x * mf
        u_y = jnp.where(ey <= k2, 1.0, hk * jax.lax.rsqrt(ey)) * g_y * mf
        w_x = -r00 * sy + r01 * sx
        w_y = -r10 * sy + r11 * sx

        def rsum(v):
            return jnp.sum(v, axis=1, keepdims=True)  # (8, 1)

        s_u_x = rsum(u_x)
        s_uw_x = rsum(u_x * w_x)
        s_uw2_x = rsum(u_x * w_x * w_x)
        s_ur_x = rsum(u_x * rx)
        s_uwr_x = rsum(u_x * w_x * rx)
        s_u_y = rsum(u_y)
        s_uw_y = rsum(u_y * w_y)
        s_uw2_y = rsum(u_y * w_y * w_y)
        s_ur_y = rsum(u_y * ry)
        s_uwr_y = rsum(u_y * w_y * ry)
        e = ex + ey
        err = rsum(jnp.where(e <= k2, e, 2.0 * hk * jnp.sqrt(e) - k2) * mf)

        # symmetric 3x3 normal equations (docs/jacobian.md), per pair
        h00 = r00 * r00 * s_u_x + r10 * r10 * s_u_y
        h01 = r00 * r01 * s_u_x + r10 * r11 * s_u_y
        h02 = r00 * s_uw_x + r10 * s_uw_y
        h11 = r01 * r01 * s_u_x + r11 * r11 * s_u_y
        h12 = r01 * s_uw_x + r11 * s_uw_y
        h22 = s_uw2_x + s_uw2_y
        b0 = r00 * s_ur_x + r10 * s_ur_y
        b1 = r01 * s_ur_x + r11 * s_ur_y
        b2 = s_uwr_x + s_uwr_y

        det = (h00 * (h11 * h22 - h12 * h12)
               - h01 * (h01 * h22 - h12 * h02)
               + h02 * (h01 * h12 - h11 * h02))
        if det_rel_eps > 0.0:
            mx = jnp.maximum(
                jnp.maximum(jnp.abs(h00), jnp.abs(h01)),
                jnp.maximum(
                    jnp.maximum(jnp.abs(h02), jnp.abs(h11)),
                    jnp.maximum(jnp.abs(h12), jnp.abs(h22)),
                ),
            )
            ok = jnp.abs(det) > jnp.float32(det_rel_eps) * mx * mx * mx
        else:
            ok = det != 0.0
        ok = ok & (n >= 2)
        safe_det = jnp.where(ok, det, one)
        a00 = h11 * h22 - h12 * h12
        a01 = h02 * h12 - h01 * h22
        a02 = h01 * h12 - h02 * h11
        a11 = h00 * h22 - h02 * h02
        a12 = h01 * h02 - h00 * h12
        a22 = h00 * h11 - h01 * h01
        d0 = -(a00 * b0 + a01 * b1 + a02 * b2) / safe_det
        d1 = -(a01 * b0 + a11 * b1 + a12 * b2) / safe_det
        d2 = -(a02 * b0 + a12 * b1 + a22 * b2) / safe_det
        d0 = jnp.where(ok, d0, zero)
        d1 = jnp.where(ok, d1, zero)
        d2 = jnp.where(ok, d2, zero)

        # stop conditions, in estimate_transform's exact order
        stop = ~ok
        scale = jnp.float32(point_scale)
        d2_phys = (d0 * scale) ** 2 + (d1 * scale) ** 2 + d2 * d2
        stop = stop | (d2_phys < jnp.float32(tol_d2))
        stop = stop | (err > prev)

        # SE(2) exp (small-angle branch matching geometry.se2), per pair
        th = d2
        small = jnp.abs(th) < jnp.float32(_SMALL_ANGLE_F32)
        safe_th = jnp.where(small, one, th)
        t2 = th * th
        av = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe_th) / safe_th)
        bv = jnp.where(small, th / 2.0 - t2 * th / 24.0,
                       (1.0 - jnp.cos(safe_th)) / safe_th)
        tdx = av * d0 - bv * d1
        tdy = bv * d0 + av * d1
        cth = jnp.cos(th)
        sth = jnp.sin(th)
        n00 = cth * r00 - sth * r10
        n01 = cth * r01 - sth * r11
        n10 = sth * r00 + cth * r10
        n11 = sth * r01 + cth * r11
        ntx = cth * tx - sth * ty + tdx
        nty = sth * tx + cth * ty + tdy

        active = done == 0
        keep = stop | ~active  # done pairs stay frozen
        r00n = jnp.where(keep, r00, n00)
        r01n = jnp.where(keep, r01, n01)
        r10n = jnp.where(keep, r10, n10)
        r11n = jnp.where(keep, r11, n11)
        txn = jnp.where(keep, tx, ntx)
        tyn = jnp.where(keep, ty, nty)
        prev_n = jnp.where(keep, prev, err)
        done_n = jnp.where(active & stop, 1, done)
        return (r00n, r01n, r10n, r11n, txn, tyn, it + 1, done_n, prev_n)

    ones = jnp.ones((blk, 1), jnp.float32)
    zeros = jnp.zeros((blk, 1), jnp.float32)
    init = (ones, zeros, zeros, ones, zeros, zeros, 0,
            jnp.zeros((blk, 1), jnp.int32),
            jnp.full((blk, 1), jnp.finfo(jnp.float32).max))
    r00, r01, r10, r11, tx, ty, it, done, _ = jax.lax.while_loop(
        cond, body, init
    )
    out_ref[:, 0] = r00[:, 0]
    out_ref[:, 1] = r01[:, 0]
    out_ref[:, 2] = r10[:, 0]
    out_ref[:, 3] = r11[:, 0]
    out_ref[:, 4] = tx[:, 0]
    out_ref[:, 5] = ty[:, 0]
    out_ref[:, 6] = jnp.full((blk,), it, jnp.float32)
    out_ref[:, 7] = jnp.zeros((blk,), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("huber_k", "det_rel_eps", "tol_d2", "max_iter",
                     "point_scale", "interpret"),
)
def estimate_transform_pallas_batched(
    src: Array,
    dst: Array,
    mask: Array,
    huber_k: float,
    det_rel_eps: float,
    tol_d2: float,
    max_iter: int,
    point_scale: float,
    interpret: bool = False,
):
    """Whole inner IRLS loop for EVERY pair, desynchronized per _PAIR_BLK-pair
    block.  src/dst: (B, N, 2), N a multiple of 128; mask (B, N).
    Returns (rot (B, 2, 2), t (B, 2)) in solver units, starting from
    identity — per-pair semantics identical to the lockstep loop."""
    b, n_pts, _ = src.shape
    b_pad = -(-b // _PAIR_BLK) * _PAIR_BLK
    if b_pad != b:
        pad = [(0, b_pad - b)]
        src = jnp.pad(src, pad + [(0, 0), (0, 0)])
        dst = jnp.pad(dst, pad + [(0, 0), (0, 0)])
        # padded pairs: mask all-False -> n=0 -> not ok -> stop at iter 1
        mask = jnp.pad(mask, pad + [(0, 0)])

    sx = src[..., 0]
    sy = src[..., 1]
    dx = dst[..., 0]
    dy = dst[..., 1]
    mf = mask.astype(jnp.float32)

    spec = pl.BlockSpec((_PAIR_BLK, n_pts), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _inner_loop_batched_kernel, huber_k=float(huber_k),
            det_rel_eps=float(det_rel_eps), tol_d2=float(tol_d2),
            max_iter=int(max_iter), point_scale=float(point_scale),
        ),
        grid=(b_pad // _PAIR_BLK,),
        in_specs=[spec] * 5,
        out_specs=pl.BlockSpec((_PAIR_BLK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, 8), jnp.float32),
        interpret=interpret,
    )(sx, sy, dx, dy, mf)
    out = out[:b]
    rot = jnp.stack([
        jnp.stack([out[:, 0], out[:, 1]], axis=-1),
        jnp.stack([out[:, 2], out[:, 3]], axis=-1),
    ], axis=-2)
    t = out[:, 4:6]
    return rot, t
