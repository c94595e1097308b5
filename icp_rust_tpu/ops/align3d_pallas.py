"""Fused Pallas TPU kernel: one launch per robust point-to-plane GN update.

SE(3) analogue of ops/align2d_pallas.py for the point-to-plane residual
r = n . (T(s) - d) (ops/align3d.py).  Per launch, VMEM-resident:

  1. p = R s + t, scalar residual r per point
  2. robust sigma: exact 2-bit radix-select median + MAD over the single
     residual dimension (reference robust-scale semantics,
     src/stats.rs:18-60 applied at D=1)
  3. Huber IRLS weights u = drho(r^2, k) / sigma, masked
  4. the 6x6 normal equations: J = [n | p x n] varies fully per point,
     so the sums are the 21 unique entries of sum(u J J^T), the 6 of
     sum(u J r), plus the Huber error and count — 29 lane reductions
     over (M, 128) blocks, trivially cheap once inside one kernel.

Output: a (1, 32) packed f32 vector; ops/align3d.py assembles and solves
the 6x6 system host-side (LU stays in XLA).

Layout: every per-point array is (M, 128) with N = M*128 (callers pad).
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

from icp_rust_tpu.ops.align2d_pallas import _MAD_SCALE, _order_keys_u32

_LANES = 128


def _median_radix2_single(x, mask, n):
    """Exact masked median of one (M, 128) f32 array (scalar rank)."""
    keys = _order_keys_u32(x)

    h = n // 2
    cand = mask
    r = h
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    for p in range(16):
        shift = 30 - 2 * p
        digit = (keys >> shift) & 0x3
        c0 = jnp.sum(jnp.where(cand & (digit == 0), one, zero)).astype(
            jnp.int32)
        c1 = jnp.sum(jnp.where(cand & (digit == 1), one, zero)).astype(
            jnp.int32)
        c2 = jnp.sum(jnp.where(cand & (digit == 2), one, zero)).astype(
            jnp.int32)
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
    v_hi = jnp.min(jnp.where(cand, x, inf))

    less = mask & (x < v_hi)
    cnt_less = jnp.sum(jnp.where(less, one, zero)).astype(jnp.int32)
    vmax_less = jnp.max(jnp.where(less, x, -inf))
    v_lo = jnp.where(cnt_less == h, vmax_less, v_hi)
    odd = (n % 2) == 1
    med = jnp.where(odd, v_hi, 0.5 * (v_lo + v_hi))
    return jnp.where(n > 0, med, 0.0)


def _p2l_stats_core(rot9, t3, sx, sy, sz, dx, dy, dz, nx, ny, nz, mask,
                    mf, n_cnt, huber_k: float):
    """Per-iteration p2l statistics; rot9/t3 are scalar tuples.  Returns
    (jtj_upper (21 scalars), jtr (6 scalars), err, sig)."""
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = rot9
    tx, ty, tz = t3
    px = r00 * sx + r01 * sy + r02 * sz + tx
    py = r10 * sx + r11 * sy + r12 * sz + ty
    pz = r20 * sx + r21 * sy + r22 * sz + tz
    r = nx * (px - dx) + ny * (py - dy) + nz * (pz - dz)

    med = _median_radix2_single(r, mask, n_cnt)
    mad = _median_radix2_single(jnp.abs(r - med), mask, n_cnt)
    sig = jnp.float32(_MAD_SCALE) * mad
    g = jnp.where(sig != 0.0, 1.0 / jnp.where(sig != 0.0, sig, 1.0), 0.0)

    k2 = jnp.float32(huber_k * huber_k)
    hk = jnp.float32(huber_k)
    e = r * r
    u = jnp.where(e <= k2, 1.0, hk * jax.lax.rsqrt(e)) * g * mf

    # J = [n | p x n]
    j3 = py * nz - pz * ny
    j4 = pz * nx - px * nz
    j5 = px * ny - py * nx
    js = (nx, ny, nz, j3, j4, j5)

    jtj = []
    for a in range(6):
        for b in range(a, 6):
            jtj.append(jnp.sum(u * js[a] * js[b]))
    jtr = [jnp.sum(u * js[a] * r) for a in range(6)]
    rho = jnp.where(e <= k2, e, 2.0 * hk * jnp.sqrt(e) - k2)
    err = jnp.sum(rho * mf)
    return jtj, jtr, err, sig


def _p2l_kernel(params_ref, sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref,
                nx_ref, ny_ref, nz_ref, m_ref, out_ref, *, huber_k: float):
    pr = params_ref
    rot9 = (pr[0, 0], pr[0, 1], pr[0, 2], pr[0, 3], pr[0, 4], pr[0, 5],
            pr[0, 6], pr[0, 7], pr[0, 8])
    t3 = (pr[0, 9], pr[0, 10], pr[0, 11])

    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n_cnt = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)

    jtj, jtr, err, sig = _p2l_stats_core(
        rot9, t3, sx_ref[:], sy_ref[:], sz_ref[:], dx_ref[:], dy_ref[:],
        dz_ref[:], nx_ref[:], ny_ref[:], nz_ref[:], mask, mf, n_cnt,
        huber_k,
    )
    for i in range(21):
        out_ref[0, i] = jtj[i]
    for a in range(6):
        out_ref[0, 21 + a] = jtr[a]
    out_ref[0, 27] = err
    out_ref[0, 28] = n_cnt.astype(jnp.float32)
    out_ref[0, 29] = sig
    out_ref[0, 30] = 0.0
    out_ref[0, 31] = 0.0


@functools.partial(jax.jit, static_argnames=("huber_k", "interpret"))
def p2l_stats_pallas(
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    rot: Array,
    t: Array,
    huber_k: float,
    interpret: bool = False,
) -> Array:
    """src/dst/normals: (N, 3), N a multiple of 128; mask: (N,).
    Returns the packed (32,) f32 stats vector."""
    n = src.shape[0]
    shape = (n // _LANES, _LANES)
    cols = [src[:, i].reshape(shape) for i in range(3)]
    cols += [dst[:, i].reshape(shape) for i in range(3)]
    cols += [normals[:, i].reshape(shape) for i in range(3)]
    mf = mask.astype(jnp.float32).reshape(shape)
    params = jnp.concatenate(
        [rot.reshape(-1), t.reshape(-1), jnp.zeros(4, rot.dtype)]
    ).astype(jnp.float32).reshape(1, 16)

    out = pl.pallas_call(
        functools.partial(_p2l_kernel, huber_k=float(huber_k)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        interpret=interpret,
    )(params, *cols, mf)
    return out[0]


def assemble_p2l(stats: Array):
    """(jtj (6,6), jtr (6,), err, count, sigma) from the packed stats."""
    idx = 0
    rows = [[None] * 6 for _ in range(6)]
    for a in range(6):
        for b in range(a, 6):
            rows[a][b] = stats[idx]
            rows[b][a] = stats[idx]
            idx += 1
    jtj = jnp.stack([jnp.stack(r) for r in rows])
    jtr = stats[21:27]
    return jtj, jtr, stats[27], stats[28], stats[29]


# ---------------------------------------------------------------------------
# The ENTIRE p2l inner loop in one kernel launch (SE(3) analogue of
# align2d_pallas._inner_loop_kernel): scalar carries, in-kernel 6x6
# Cholesky solve (the system is SPD by construction), Rodrigues/V-matrix
# SE(3) exponential with geometry.se3's Taylor branches, and the three
# stop conditions in estimate_transform_p2l's exact order.
# ---------------------------------------------------------------------------

_SMALL_F32 = float(jnp.finfo(jnp.float32).eps) ** 0.25


def _chol_solve6(jtj, jtr):
    """Scalar 6x6 Cholesky solve.  jtj: 21 upper-triangle scalars (row
    major a<=b); jtr: 6 scalars.  Returns (x list of 6, ok)."""
    a = [[None] * 6 for _ in range(6)]
    idx = 0
    for i in range(6):
        for j in range(i, 6):
            a[i][j] = jtj[idx]
            a[j][i] = jtj[idx]
            idx += 1
    one = jnp.float32(1.0)
    ok = jnp.bool_(True)
    l = [[jnp.float32(0.0)] * 6 for _ in range(6)]
    for i in range(6):
        d = a[i][i]
        for k in range(i):
            d = d - l[i][k] * l[i][k]
        ok = ok & (d > 0.0)
        d_safe = jnp.where(d > 0.0, d, one)
        lii = jnp.sqrt(d_safe)
        l[i][i] = lii
        inv_lii = 1.0 / lii
        for j in range(i + 1, 6):
            v = a[j][i]
            for k in range(i):
                v = v - l[j][k] * l[i][k]
            l[j][i] = v * inv_lii
    # forward: L y = b
    y = [None] * 6
    for i in range(6):
        v = jtr[i]
        for k in range(i):
            v = v - l[i][k] * y[k]
        y[i] = v / l[i][i]
    # backward: L^T x = y
    x = [None] * 6
    for i in reversed(range(6)):
        v = y[i]
        for k in range(i + 1, 6):
            v = v - l[k][i] * x[k]
        x[i] = v / l[i][i]
    for i in range(6):
        ok = ok & jnp.isfinite(x[i])
    return x, ok


def _p2l_loop_kernel(sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref,
                     nx_ref, ny_ref, nz_ref, m_ref, out_ref, *,
                     huber_k: float, tol_d2: float, max_iter: int,
                     point_scale: float):
    sx = sx_ref[:]
    sy = sy_ref[:]
    sz = sz_ref[:]
    dx = dx_ref[:]
    dy = dy_ref[:]
    dz = dz_ref[:]
    nx = nx_ref[:]
    ny = ny_ref[:]
    nz = nz_ref[:]
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n_cnt = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)

    def cond(c):
        return (c[12] < max_iter) & (c[13] == 0)

    def body(c):
        (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz,
         it, done, prev_err) = c
        jtj, jtr, err, sig = _p2l_stats_core(
            (r00, r01, r02, r10, r11, r12, r20, r21, r22), (tx, ty, tz),
            sx, sy, sz, dx, dy, dz, nx, ny, nz, mask, mf, n_cnt, huber_k,
        )
        x, solve_ok = _chol_solve6(jtj, jtr)
        ok = solve_ok & (n_cnt >= 6) & (sig != 0.0)
        d = [jnp.where(ok, -x[i], zero) for i in range(6)]

        stop = ~ok
        s2 = jnp.float32(point_scale * point_scale)
        d2_phys = (d[0] * d[0] + d[1] * d[1] + d[2] * d[2]) * s2 + (
            d[3] * d[3] + d[4] * d[4] + d[5] * d[5])
        stop = stop | (d2_phys < jnp.float32(tol_d2))
        stop = stop | (err > prev_err)

        # SE(3) exp of (v, w) with geometry.se3's Taylor branches
        w0, w1, w2 = d[3], d[4], d[5]
        th2 = w0 * w0 + w1 * w1 + w2 * w2
        th = jnp.sqrt(th2)
        small = th < jnp.float32(_SMALL_F32)
        safe2 = jnp.where(small, one, th2)
        safe = jnp.sqrt(safe2)
        av = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(safe) / safe)
        bv = jnp.where(small, 0.5 - th2 / 24.0,
                       (1.0 - jnp.cos(safe)) / safe2)
        cv = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                       (safe - jnp.sin(safe)) / (safe2 * safe))
        # K and K^2 entries
        k2_00 = -(w1 * w1 + w2 * w2)
        k2_11 = -(w0 * w0 + w2 * w2)
        k2_22 = -(w0 * w0 + w1 * w1)
        k2_01 = w0 * w1
        k2_02 = w0 * w2
        k2_12 = w1 * w2
        # R_delta = I + a K + b K^2
        e00 = 1.0 + bv * k2_00
        e01 = -av * w2 + bv * k2_01
        e02 = av * w1 + bv * k2_02
        e10 = av * w2 + bv * k2_01
        e11 = 1.0 + bv * k2_11
        e12 = -av * w0 + bv * k2_12
        e20 = -av * w1 + bv * k2_02
        e21 = av * w0 + bv * k2_12
        e22 = 1.0 + bv * k2_22
        # V = I + b K + c K^2; t_delta = V v
        v00 = 1.0 + cv * k2_00
        v01 = -bv * w2 + cv * k2_01
        v02 = bv * w1 + cv * k2_02
        v10 = bv * w2 + cv * k2_01
        v11 = 1.0 + cv * k2_11
        v12 = -bv * w0 + cv * k2_12
        v20 = -bv * w1 + cv * k2_02
        v21 = bv * w0 + cv * k2_12
        v22 = 1.0 + cv * k2_22
        tdx = v00 * d[0] + v01 * d[1] + v02 * d[2]
        tdy = v10 * d[0] + v11 * d[1] + v12 * d[2]
        tdz = v20 * d[0] + v21 * d[1] + v22 * d[2]
        # compose: R <- E R, t <- E t + t_delta
        nr = [
            e00 * r00 + e01 * r10 + e02 * r20,
            e00 * r01 + e01 * r11 + e02 * r21,
            e00 * r02 + e01 * r12 + e02 * r22,
            e10 * r00 + e11 * r10 + e12 * r20,
            e10 * r01 + e11 * r11 + e12 * r21,
            e10 * r02 + e11 * r12 + e12 * r22,
            e20 * r00 + e21 * r10 + e22 * r20,
            e20 * r01 + e21 * r11 + e22 * r21,
            e20 * r02 + e21 * r12 + e22 * r22,
        ]
        ntx = e00 * tx + e01 * ty + e02 * tz + tdx
        nty = e10 * tx + e11 * ty + e12 * tz + tdy
        ntz = e20 * tx + e21 * ty + e22 * tz + tdz

        keep = stop
        cur = (r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz)
        new = (*nr, ntx, nty, ntz)
        out = tuple(jnp.where(keep, c_, n_) for c_, n_ in zip(cur, new))
        prev_n = jnp.where(keep, prev_err, err)
        return (*out, it + 1, jnp.where(stop, 1, 0), prev_n)

    init = (one, zero, zero, zero, one, zero, zero, zero, one,
            zero, zero, zero, 0, 0, jnp.float32(jnp.finfo(jnp.float32).max))
    res = jax.lax.while_loop(cond, body, init)
    for i in range(12):
        out_ref[0, i] = res[i]
    out_ref[0, 12] = res[12].astype(jnp.float32)
    out_ref[0, 13] = 0.0
    out_ref[0, 14] = 0.0
    out_ref[0, 15] = 0.0


@functools.partial(
    jax.jit,
    static_argnames=("huber_k", "tol_d2", "max_iter", "point_scale",
                     "interpret"),
)
def estimate_transform_p2l_pallas(
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    huber_k: float,
    tol_d2: float,
    max_iter: int,
    point_scale: float,
    interpret: bool = False,
):
    """The whole p2l IRLS loop in ONE kernel launch.  src/dst/normals:
    (N, 3), N a multiple of 128; mask: (N,).  Returns (rot (3,3), t (3,))
    starting from identity — estimate_transform_p2l's semantics at f32
    roundoff (Cholesky vs LU ordering differences only)."""
    n = src.shape[0]
    shape = (n // _LANES, _LANES)
    cols = [src[:, i].reshape(shape) for i in range(3)]
    cols += [dst[:, i].reshape(shape) for i in range(3)]
    cols += [normals[:, i].reshape(shape) for i in range(3)]
    mf = mask.astype(jnp.float32).reshape(shape)

    out = pl.pallas_call(
        functools.partial(
            _p2l_loop_kernel, huber_k=float(huber_k),
            tol_d2=float(tol_d2), max_iter=int(max_iter),
            point_scale=float(point_scale),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 16), jnp.float32),
        interpret=interpret,
    )(*cols, mf)
    rot = jnp.stack([
        jnp.stack([out[0, 0], out[0, 1], out[0, 2]]),
        jnp.stack([out[0, 3], out[0, 4], out[0, 5]]),
        jnp.stack([out[0, 6], out[0, 7], out[0, 8]]),
    ])
    t = jnp.stack([out[0, 9], out[0, 10], out[0, 11]])
    return rot, t
