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


def _p2l_kernel(params_ref, sx_ref, sy_ref, sz_ref, dx_ref, dy_ref, dz_ref,
                nx_ref, ny_ref, nz_ref, m_ref, out_ref, *, huber_k: float):
    pr = params_ref
    r00, r01, r02 = pr[0, 0], pr[0, 1], pr[0, 2]
    r10, r11, r12 = pr[0, 3], pr[0, 4], pr[0, 5]
    r20, r21, r22 = pr[0, 6], pr[0, 7], pr[0, 8]
    tx, ty, tz = pr[0, 9], pr[0, 10], pr[0, 11]

    sx = sx_ref[:]
    sy = sy_ref[:]
    sz = sz_ref[:]
    nx = nx_ref[:]
    ny = ny_ref[:]
    nz = nz_ref[:]
    mask = m_ref[:] > 0.5
    mf = jnp.where(mask, 1.0, 0.0)
    n_cnt = jnp.sum(jnp.where(mask, 1, 0), dtype=jnp.int32)

    px = r00 * sx + r01 * sy + r02 * sz + tx
    py = r10 * sx + r11 * sy + r12 * sz + ty
    pz = r20 * sx + r21 * sy + r22 * sz + tz
    r = nx * (px - dx_ref[:]) + ny * (py - dy_ref[:]) + nz * (pz - dz_ref[:])

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

    idx = 0
    for a in range(6):
        for b in range(a, 6):
            out_ref[0, idx] = jnp.sum(u * js[a] * js[b])
            idx += 1
    for a in range(6):
        out_ref[0, 21 + a] = jnp.sum(u * js[a] * r)
    rho = jnp.where(e <= k2, e, 2.0 * hk * jnp.sqrt(e) - k2)
    out_ref[0, 27] = jnp.sum(rho * mf)
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
