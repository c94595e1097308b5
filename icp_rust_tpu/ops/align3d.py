"""SE(3) robust point-to-plane Gauss-Newton alignment, batched and masked.

No reference counterpart (the reference solves SE(2) point-to-point only);
this is the build's 3D config (BASELINE.json configs[1]).  The robust
machinery deliberately mirrors the reference's 2D design so behavior is
predictable across configs:

- scalar residual r_i = n_i . (T(s_i) - d_i) per correspondence;
- robust sigma = 1.4826 * MAD over the residuals (the D=1 analogue of
  reference src/stats.rs:49-60), dimension skipped if sigma == 0;
- IRLS weight w = drho(r^2, huber_k) (reference src/huber.rs:17-26);
- inner loop with the reference's stop conditions in the same order
  (src/lib.rs:59-84), left-composed Exp(delta).

Jacobian (left-multiplicative convention, T <- Exp(delta) o T, twist
(v, w)): with p = T(s), d r/d v = n and d r/d w = p x n.
The 6x6 normal equations are solved with an LU solve; ok-gating mirrors
the 3x3 path (non-finite or singular -> no-op update).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.config import ICPConfig
from icp_rust_tpu.geometry.transform3d import RigidTransform3
from icp_rust_tpu.ops import huber, robust


class GNUpdate6(NamedTuple):
    delta: Array  # (..., 6)
    ok: Array     # (...,)
    err: Array    # (...,) Huber error at the PRE-update transform


def plane_residuals(
    transform: RigidTransform3, src: Array, dst: Array, normals: Array
) -> Array:
    """n_i . (T(s_i) - d_i); (..., N)."""
    p = transform.apply_points(src)
    return jnp.sum((p - dst) * normals, axis=-1)


def huber_error_p2l(
    transform: RigidTransform3,
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    huber_k: float,
) -> Array:
    r = plane_residuals(transform, src, dst, normals)
    return jnp.sum(huber.rho(r * r, huber_k) * mask, axis=-1)


def weighted_gn_update_p2l(
    transform: RigidTransform3,
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    huber_k: float,
    axis_name: str | None = None,
) -> GNUpdate6:
    maskf = mask.astype(src.dtype)
    r = plane_residuals(transform, src, dst, normals)  # (..., N)
    if axis_name:
        # Robust sigma is a global order statistic: gather the scalar
        # residuals across the point-sharded axis so every device
        # computes the identical MAD (same pattern as align2d's 2D path).
        r_all = jax.lax.all_gather(r, axis_name, axis=-1, tiled=True)
        mask_all = jax.lax.all_gather(mask, axis_name, axis=-1, tiled=True)
        sigma, stats_valid = robust.masked_stddev(r_all, mask_all)
    else:
        sigma, stats_valid = robust.masked_stddev(r, mask)  # (...,), (...,)
    dim_ok = sigma != 0.0
    g = jnp.where(dim_ok, 1.0 / jnp.where(dim_ok, sigma, 1.0), 0.0)
    w = huber.drho(r * r, huber_k)  # (..., N)
    u = w * g[..., None] * maskf  # (..., N)

    p = transform.apply_points(src)  # (..., N, 3)
    j_rot = jnp.cross(p, normals)  # (..., N, 3) = p x n
    j = jnp.concatenate([normals, j_rot], axis=-1)  # (..., N, 6)
    jtr = jnp.einsum("...n,...nk,...n->...k", u, j, r)
    jtj = jnp.einsum("...n,...nk,...nl->...kl", u, j, j)
    err = jnp.sum(huber.rho(r * r, huber_k) * maskf, axis=-1)
    n_valid = jnp.sum(mask, axis=-1)
    if axis_name:
        jtr = jax.lax.psum(jtr, axis_name)
        jtj = jax.lax.psum(jtj, axis_name)
        err = jax.lax.psum(err, axis_name)
        n_valid = jax.lax.psum(n_valid, axis_name)

    n_ok = n_valid >= 6
    x, solve_ok = _solve6(jtj, jtr, n_ok)
    ok = solve_ok & stats_valid & dim_ok
    delta = jnp.where(ok[..., None], -x, jnp.zeros_like(x))
    return GNUpdate6(delta, ok, err)


def _solve6(jtj, jtr, n_ok):
    """Gated 6x6 LU solve shared by the XLA and Pallas p2l updates.

    Returns (x, ok): LU on an identity-substituted system where n_ok is
    False; ok additionally requires finite x and a small back-substitution
    residual (the (near-)singularity rejection, robust in f32).
    """
    eye = jnp.eye(6, dtype=jtj.dtype)
    jtj_safe = jnp.where(n_ok[..., None, None], jtj, eye)
    x = jnp.linalg.solve(jtj_safe, jtr[..., None])[..., 0]
    finite = jnp.all(jnp.isfinite(x), axis=-1)
    back = jnp.einsum("...kl,...l->...k", jtj_safe, x)
    # Residual test against the SYSTEM scale (inf-norm of jtr), not
    # per-component: components of jtr orders of magnitude below the
    # largest carry LU roundoff from the large entries, so a
    # per-component relative gate falsely rejects well-conditioned
    # near-converged solves (jtr -> 0 anisotropically as ICP converges —
    # observed with voxel normals, where the z/rotation scales differ by
    # ~1e5 and the warm-started driver froze at its initial transform).
    scale = jnp.max(jnp.abs(jtr), axis=-1, keepdims=True)
    resid_ok = jnp.all(
        jnp.abs(back - jtr) <= 1e-3 * jnp.maximum(scale, 1e-30) + 1e-20,
        axis=-1,
    )
    return x, n_ok & finite & resid_ok


def weighted_gn_update_p2l_pallas(
    transform: RigidTransform3,
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    huber_k: float,
    interpret: bool = False,
) -> GNUpdate6:
    """Single-launch fused point-to-plane GN update
    (ops/align3d_pallas.py); same math as weighted_gn_update_p2l,
    reduction order differs at f32 roundoff."""
    from icp_rust_tpu.ops import align3d_pallas

    stats = align3d_pallas.p2l_stats_pallas(
        src, dst, normals, mask, transform.rot, transform.t, huber_k,
        interpret=interpret,
    )
    jtj, jtr, err, nf, sig = align3d_pallas.assemble_p2l(stats)
    jtj = jtj.astype(src.dtype)
    jtr = jtr.astype(src.dtype)
    n_ok = nf >= 6
    dim_ok = sig != 0.0
    x, solve_ok = _solve6(jtj, jtr, n_ok)
    ok = solve_ok & dim_ok
    delta = jnp.where(ok[..., None], -x, jnp.zeros_like(x))
    return GNUpdate6(delta, ok, err.astype(src.dtype))


def estimate_transform_p2l(
    src: Array,
    dst: Array,
    normals: Array,
    mask: Array,
    config: ICPConfig,
    axis_name: str | None = None,
) -> RigidTransform3:
    """Inner IRLS loop, fixed correspondences; reference loop structure
    (src/lib.rs:59-84) on SE(3).  With ``axis_name`` the point axis is
    sharded: sigma all_gathers, the normal equations psum, and the
    replicated solve keeps every shard's loop in lockstep."""
    dtype = src.dtype
    batch = src.shape[:-2]
    huber_k = config.huber_k / config.point_scale

    t0 = RigidTransform3.identity(batch, dtype)
    prev0 = jnp.full(batch, jnp.finfo(dtype).max, dtype=dtype)
    done0 = jnp.zeros(batch, dtype=bool)

    def cond(carry):
        _, _, done, it = carry
        return (it < config.inner_max_iter) & jnp.any(~done)

    use_pallas = (
        config.align_backend == "pallas"
        and axis_name is None
        and src.ndim == 2
        and src.shape[-2] % 128 == 0
        and src.dtype == jnp.float32
        and jax.default_backend() == "tpu"
    )

    if use_pallas:
        # The WHOLE loop in one kernel launch (in-kernel 6x6 Cholesky,
        # SE(3) exponential) — see ops/align3d_pallas._p2l_loop_kernel.
        from icp_rust_tpu.ops import align3d_pallas

        rot, t = align3d_pallas.estimate_transform_p2l_pallas(
            src, dst, normals, mask, huber_k,
            config.inner_delta_sq_tol, config.inner_max_iter,
            config.point_scale,
        )
        return RigidTransform3(rot, t)

    def body(carry):
        t, prev, done, it = carry
        if use_pallas:
            upd = weighted_gn_update_p2l_pallas(
                t, src, dst, normals, mask, huber_k
            )
        else:
            upd = weighted_gn_update_p2l(t, src, dst, normals, mask,
                                         huber_k, axis_name)
        d2 = jnp.sum(upd.delta * upd.delta, axis=-1)
        # Physical-units threshold: translation components rescale.
        s2 = config.point_scale**2
        d2_phys = (
            jnp.sum(upd.delta[..., :3] ** 2, axis=-1) * s2
            + jnp.sum(upd.delta[..., 3:] ** 2, axis=-1)
        )
        stop = ~upd.ok | (d2_phys < config.inner_delta_sq_tol)
        e = upd.err  # residuals already walked in the GN update
        stop |= e > prev
        newly = done | stop
        t_step = RigidTransform3.from_twist(upd.delta).compose(t)
        t_next = RigidTransform3(
            rot=jnp.where(newly[..., None, None], t.rot, t_step.rot),
            t=jnp.where(newly[..., None], t.t, t_step.t),
        )
        return (t_next, jnp.where(newly, prev, e), newly, it + 1)

    t, _, _, _ = jax.lax.while_loop(cond, body, (t0, prev0, done0, 0))
    return t
