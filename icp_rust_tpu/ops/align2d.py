"""SE(2) robust Gauss-Newton alignment core, batched and masked.

TPU-native counterpart of the solver core of reference src/lib.rs:

- ``jacobian``: J = [R | R (-a_y, a_x)^T] in R^{2x3} per point
  (src/lib.rs:176-184; derivation src/doc/jacobian.rs).
- ``gauss_newton_update`` (src/lib.rs:191-216) and
  ``weighted_gauss_newton_update`` (src/lib.rs:218-261): fold over points
  accumulating J^T J and J^T r -> here a fused masked einsum reduction, one
  XLA kernel for the whole (possibly batched) point set.
- ``estimate_transform`` (src/lib.rs:59-84): inner IRLS loop, up to 200
  iterations with the reference's three stop conditions *in the reference's
  order* (singular/degenerate -> stop; |delta|^2 < 1e-6 checked BEFORE the
  update is applied; Huber error evaluated at the PRE-update transform must
  not exceed the previous iteration's).  Expressed as one
  ``lax.while_loop`` whose carry includes a per-batch ``done`` mask, so a
  whole batch of pairs shares a single loop (degenerate pairs freeze, the
  loop exits when all are done — SURVEY.md §7.3).

Everything takes a validity ``mask`` over the point axis; padded lanes are
excluded from medians, sums and gates.  ``Option`` returns become ``ok``
flags.

Scale preconditioning: callers may divide coordinates by config.point_scale
(and must then co-scale huber_k; the update is exactly scale-equivariant —
see config.py).  The |delta|^2 threshold is applied in *physical* units by
rescaling the translation components before the norm test.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform2d import RigidTransform2
from icp_rust_tpu.ops import huber, linalg, robust


def residuals(transform: RigidTransform2, src: Array, dst: Array) -> Array:
    """r_i = T(s_i) - d_i; (..., N, 2). Ref src/lib.rs:34-36."""
    return transform.apply_points(src) - dst


def error(
    transform: RigidTransform2,
    src: Array,
    dst: Array,
    mask: Array,
    axis_name: str | None = None,
) -> Array:
    """Masked sum of squared residual norms. Ref src/lib.rs:38-43.

    With ``axis_name`` the sum is completed across a point-sharded mesh
    axis (local partial + psum).
    """
    r = residuals(transform, src, dst)
    e = jnp.sum(jnp.sum(r * r, axis=-1) * mask, axis=-1)
    return jax.lax.psum(e, axis_name) if axis_name else e


def huber_error(
    transform: RigidTransform2,
    src: Array,
    dst: Array,
    mask: Array,
    huber_k: float,
    axis_name: str | None = None,
) -> Array:
    """Masked sum of rho(|r|^2, k). Ref src/lib.rs:45-50."""
    r = residuals(transform, src, dst)
    e = jnp.sum(huber.rho(jnp.sum(r * r, axis=-1), huber_k) * mask, axis=-1)
    return jax.lax.psum(e, axis_name) if axis_name else e


def jacobian(rot: Array, src: Array) -> Array:
    """Per-point SE(2) Jacobian.

    rot: (..., 2, 2); src: (..., N, 2) -> (..., N, 2, 3).
    J = [ R | R @ (-y, x)^T ]  (ref src/lib.rs:176-184).
    """
    n = src.shape[-2]
    arm = jnp.stack([-src[..., 1], src[..., 0]], axis=-1)  # (..., N, 2)
    rot_arm = jnp.einsum("...ij,...nj->...ni", rot, arm)  # (..., N, 2)
    rot_cols = jnp.broadcast_to(
        rot[..., None, :, :], (*rot_arm.shape[:-1], 2, 2)
    )
    return jnp.concatenate([rot_cols, rot_arm[..., :, None]], axis=-1)


def _count_gate(mask: Array, axis_name: str | None = None) -> Array:
    """check_input_size: n > 0 and n >= dim(=2). Ref src/lib.rs:186-189."""
    n = jnp.sum(mask, axis=-1)
    if axis_name:
        n = jax.lax.psum(n, axis_name)
    return n >= 2


class GNUpdate(NamedTuple):
    delta: Array  # (..., 3) twist update (zeros where not ok)
    ok: Array     # (...,) bool
    err: Array    # (...,) error at the PRE-update transform, rides along
                  # because the residuals are already in hand.  UPDATE-
                  # SPECIFIC semantics: the weighted (IRLS) update fills
                  # it with the Huber error (what the inner loop's stop-3
                  # compares, src/lib.rs:75-79); plain gauss_newton_update
                  # fills it with the unweighted squared-residual sum —
                  # do not mix the two in one stop-condition chain.


def gauss_newton_update(
    transform: RigidTransform2,
    src: Array,
    dst: Array,
    mask: Array,
    det_rel_eps: float = 0.0,
) -> GNUpdate:
    """Plain GN step. Ref src/lib.rs:191-216."""
    maskf = mask.astype(src.dtype)
    j = jacobian(transform.rot, src)
    r = residuals(transform, src, dst)
    jtr = jnp.einsum("...nik,...ni,...n->...k", j, r, maskf)
    jtj = jnp.einsum("...nik,...nil,...n->...kl", j, j, maskf)
    x, ok_solve = linalg.solve3x3(jtj, jtr, det_rel_eps)
    ok = ok_solve & _count_gate(mask)
    delta = jnp.where(ok[..., None], -x, jnp.zeros_like(x))
    err = jnp.sum(jnp.sum(r * r, axis=-1) * maskf, axis=-1)
    return GNUpdate(delta, ok, err)


def weighted_gauss_newton_update(
    transform: RigidTransform2,
    src: Array,
    dst: Array,
    mask: Array,
    huber_k: float,
    det_rel_eps: float = 0.0,
    axis_name: str | None = None,
) -> GNUpdate:
    """Robust IRLS GN step. Ref src/lib.rs:218-261.

    Per point i and residual dimension j: skip the dimension if its robust
    sigma is zero (src/lib.rs:245-247); weight w = drho(r_ij^2, k); scale
    g = 1/sigma_j; accumulate w*g*J_j^T r_ij and w*g*J_j^T J_j over the
    *rows* of J.  One fused einsum over (points x dims).
    """
    maskf = mask.astype(src.dtype)
    r = residuals(transform, src, dst)  # (..., N, 2)
    if axis_name:
        # Robust sigma is a *global* order statistic: gather the (small)
        # residual set across the point-sharded axis; every device computes
        # the identical sigma (SURVEY.md §5 long-context analogue).
        r_all = jax.lax.all_gather(r, axis_name, axis=-2, tiled=True)
        mask_all = jax.lax.all_gather(mask, axis_name, axis=-1, tiled=True)
        sigma, stats_valid = robust.calc_stddevs(r_all, mask_all)
    else:
        sigma, stats_valid = robust.calc_stddevs(r, mask)  # (..., 2), (...,)
    dim_ok = sigma != 0.0
    g = jnp.where(dim_ok, 1.0 / jnp.where(dim_ok, sigma, 1.0), 0.0)  # (..., 2)
    w = huber.drho(r * r, huber_k)  # (..., N, 2)
    u = w * g[..., None, :] * maskf[..., :, None]  # (..., N, 2)
    j = jacobian(transform.rot, src)  # (..., N, 2, 3)
    jtr = jnp.einsum("...ni,...nik,...ni->...k", u, j, r)
    jtj = jnp.einsum("...ni,...nik,...nil->...kl", u, j, j)
    err = jnp.sum(huber.rho(jnp.sum(r * r, axis=-1), huber_k) * maskf,
                  axis=-1)
    if axis_name:
        jtr = jax.lax.psum(jtr, axis_name)
        jtj = jax.lax.psum(jtj, axis_name)
        err = jax.lax.psum(err, axis_name)
    x, ok_solve = linalg.solve3x3(jtj, jtr, det_rel_eps)
    ok = ok_solve & _count_gate(mask, axis_name) & stats_valid
    delta = jnp.where(ok[..., None], -x, jnp.zeros_like(x))
    return GNUpdate(delta, ok, err)


def weighted_gn_update_pallas(
    transform: RigidTransform2,
    src: Array,
    dst: Array,
    mask: Array,
    huber_k: float,
    det_rel_eps: float = 0.0,
    interpret: bool = False,
) -> GNUpdate:
    """Single-launch fused GN update (ops/align2d_pallas.py).

    src/dst (N, 2) use the single-cloud kernel; (B, N, 2) the
    pair-vectorized batched kernel (pairs along sublanes, points along
    lanes, one launch for the whole batch).  Same math as
    weighted_gauss_newton_update; reduction order differs at f32
    roundoff.
    """
    from icp_rust_tpu.ops import align2d_pallas

    if src.ndim == 3:
        stats = align2d_pallas.gn_stats_pallas_batched(
            src, dst, mask, transform.rot, transform.t, huber_k,
            interpret=interpret,
        )
    else:
        stats = align2d_pallas.gn_stats_pallas(
            src, dst, mask, transform.rot, transform.t, huber_k,
            interpret=interpret,
        )
    jtj, jtr, err, nf, sig_x, sig_y = align2d_pallas.assemble_update(
        stats, transform.rot
    )
    jtj = jtj.astype(src.dtype)
    jtr = jtr.astype(src.dtype)
    x, ok_solve = linalg.solve3x3(jtj, jtr, det_rel_eps)
    stats_valid = nf > 0
    ok = ok_solve & (nf >= 2) & stats_valid
    delta = jnp.where(ok[..., None], -x, jnp.zeros_like(x))
    return GNUpdate(delta, ok, err.astype(src.dtype))


def _delta_sq_physical(delta: Array, point_scale: float) -> Array:
    """|delta|^2 with translation components rescaled to physical units."""
    s = point_scale
    return (
        (delta[..., 0] * s) ** 2
        + (delta[..., 1] * s) ** 2
        + delta[..., 2] ** 2
    )


def estimate_transform(
    src: Array,
    dst: Array,
    mask: Array,
    config: ICPConfig,
    axis_name: str | None = None,
) -> RigidTransform2:
    """Inner alignment loop with FIXED correspondences. Ref src/lib.rs:59-84.

    src/dst: (..., N, 2) in (possibly scaled) solver units; mask (..., N).
    Starts from identity; left-composes Exp(delta).  Batched: the while_loop
    carries a per-batch ``done`` mask and exits when all lanes are done.
    """
    dtype = src.dtype
    batch = src.shape[:-2]
    huber_k = config.huber_k / config.point_scale

    t0 = RigidTransform2.identity(batch, dtype)
    prev_err0 = jnp.full(batch, jnp.finfo(dtype).max, dtype=dtype)
    done0 = jnp.zeros(batch, dtype=bool)

    def cond(carry):
        _, _, done, it = carry
        return (it < config.inner_max_iter) & jnp.any(~done)

    use_pallas = (
        config.align_backend == "pallas"
        and axis_name is None
        and src.ndim in (2, 3)
        and src.shape[-2] % 128 == 0
        and src.dtype == jnp.float32
        and jax.default_backend() == "tpu"
        # The batched kernel holds the whole (B, N) problem in VMEM; cap
        # its footprint (proven at 209x768) and fall back to the XLA
        # einsum path for bigger batches rather than failing to compile.
        and (src.ndim == 2
             or src.shape[-3] * src.shape[-2] <= (1 << 18))
    )

    if use_pallas and src.ndim == 2:
        # Unbatched on TPU: the WHOLE loop is one kernel launch
        # (ops/align2d_pallas._inner_loop_kernel) — on iteration-heavy
        # workloads the ~30 us of inter-kernel gaps per iteration
        # otherwise dominate.
        from icp_rust_tpu.ops import align2d_pallas

        rot, t = align2d_pallas.estimate_transform_pallas(
            src, dst, mask, huber_k, config.det_rel_eps,
            config.inner_delta_sq_tol, config.inner_max_iter,
            config.point_scale,
        )
        return RigidTransform2(rot, t)

    if use_pallas and src.ndim == 3:
        # Batched on TPU: whole loop in one launch, desynchronized per
        # pair-block grid step (align2d_pallas._PAIR_BLK) — the lockstep per-iteration loop paid the
        # slowest pair's ~38 iterations for all pairs against a p90 of
        # ~10 (align2d_pallas._inner_loop_batched_kernel).
        from icp_rust_tpu.ops import align2d_pallas

        rot, t = align2d_pallas.estimate_transform_pallas_batched(
            src, dst, mask, huber_k, config.det_rel_eps,
            config.inner_delta_sq_tol, config.inner_max_iter,
            config.point_scale,
        )
        return RigidTransform2(rot, t)

    def _pallas_update(t, src, dst, mask):
        # ndim==3 routes to the pair-vectorized batched kernel inside
        # weighted_gn_update_pallas (one launch for the whole batch).
        return weighted_gn_update_pallas(
            t, src, dst, mask, huber_k, config.det_rel_eps
        )

    def body(carry):
        t, prev_err, done, it = carry
        if use_pallas:
            upd = _pallas_update(t, src, dst, mask)
        else:
            upd = weighted_gauss_newton_update(
                t, src, dst, mask, huber_k, config.det_rel_eps, axis_name
            )
        # Stop 1: degenerate / singular (Option::None -> break).
        stop = ~upd.ok
        # Stop 2: |delta|^2 below threshold, BEFORE applying (lib.rs:71).
        d2 = _delta_sq_physical(upd.delta, config.point_scale)
        stop |= d2 < config.inner_delta_sq_tol
        # Stop 3: Huber error at the PRE-update transform increased
        # (lib.rs:75-79).  The GN update already computed the residuals
        # at t, so the error rides along in upd.err — no second pass.
        e = upd.err
        stop |= e > prev_err
        newly_done = done | stop
        # A passing iteration applies delta AFTER the checks (lib.rs:81)
        # and records e as prev_err.
        t_step = RigidTransform2.from_twist(upd.delta).compose(t)
        keep = newly_done
        t_next = RigidTransform2(
            rot=jnp.where(keep[..., None, None], t.rot, t_step.rot),
            t=jnp.where(keep[..., None], t.t, t_step.t),
        )
        prev_next = jnp.where(keep, prev_err, e)
        return (t_next, prev_next, newly_done, it + 1)

    t, _, _, _ = jax.lax.while_loop(cond, body, (t0, prev_err0, done0, 0))
    return t
