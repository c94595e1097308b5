"""SE(2): planar rigid motions as twists, batched.

Behavioral parity with reference src/se2.rs:

- ``calc_rt(param)``: exponential map of the twist ``(vx, vy, theta)`` into
  (rotation, translation).  The reference computes
  ``t = [sin*vx - (1-cos)*vy, (1-cos)*vx + sin*vy] / theta`` with an exact
  ``theta == 0`` branch (src/se2.rs:21-41).  Here the two V-matrix
  coefficients A = sin(t)/t and B = (1-cos(t))/t are evaluated with Taylor
  fallbacks below a dtype-dependent threshold, which subsumes the
  ``theta == 0`` branch and is *more* accurate than the reference for tiny
  nonzero theta (where 1-cos underflows).
- ``exp(param)`` assembles the 3x3 homogeneous matrix (src/se2.rs:43-52).
- ``log(M)`` inverts it (src/se2.rs:54-77).  The reference special-cases
  theta==0 (V^-1 = I) and theta==pi; both are limits of the single stable
  formula used here: V^-1 = [[a, b], [-b, a]] with b = theta/2 and
  a = (theta/2) * sin / (1 - cos) = (theta/2) * cot(theta/2)
  (Taylor: 1 - theta^2/12 near 0; exactly 0 at theta = pi).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from icp_rust_tpu.geometry import so2


def _small_angle_threshold(dtype) -> float:
    # eps**0.25: ~1.9e-2 for f32, ~1.2e-4 for f64. Below this the Taylor
    # forms are more accurate than the direct trig expressions.
    return float(jnp.finfo(dtype).eps) ** 0.25


def _v_coeffs(theta: Array):
    """A = sin(t)/t and B = (1-cos(t))/t with small-angle Taylor fallback."""
    dtype = jnp.result_type(theta)
    small = jnp.abs(theta) < _small_angle_threshold(dtype)
    # Guard the divisor so the unselected branch never produces inf/nan
    # (jnp.where evaluates both branches).
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    t2 = theta * theta
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(safe) / safe)
    b = jnp.where(small, theta / 2.0 - t2 * theta / 24.0,
                  (1.0 - jnp.cos(safe)) / safe)
    return a, b


def calc_rt(param: Array):
    """Twist (..., 3) = (vx, vy, theta) -> (rot (..., 2, 2), t (..., 2)).

    Parity: reference src/se2.rs:21-41 (the twist convention means the
    translation part goes through the V matrix, not straight into t —
    reference src/transform.rs:13-16).
    """
    if param.shape[-1] != 3:
        raise ValueError(
            f"SE(2) twist must have trailing dim 3, got shape {param.shape}"
        )
    vx, vy, theta = param[..., 0], param[..., 1], param[..., 2]
    rot = so2.exp(theta)
    a, b = _v_coeffs(theta)
    t = jnp.stack([a * vx - b * vy, b * vx + a * vy], axis=-1)
    return rot, t


def exp(param: Array) -> Array:
    """Twist (..., 3) -> homogeneous matrix (..., 3, 3). Ref src/se2.rs:43-52."""
    rot, t = calc_rt(param)
    batch = param.shape[:-1]
    m = jnp.zeros((*batch, 3, 3), dtype=param.dtype)
    m = m.at[..., :2, :2].set(rot)
    m = m.at[..., :2, 2].set(t)
    m = m.at[..., 2, 2].set(1.0)
    return m


def get_rt(matrix: Array):
    """Split homogeneous (..., 3, 3) -> (rot, t). Ref src/se2.rs:11-19."""
    return matrix[..., :2, :2], matrix[..., :2, 2]


def log(matrix: Array) -> Array:
    """Homogeneous (..., 3, 3) -> twist (..., 3). Ref src/se2.rs:54-77."""
    rot, t = get_rt(matrix)
    theta = so2.log(rot)
    dtype = jnp.result_type(matrix)
    small = jnp.abs(theta) < _small_angle_threshold(dtype)
    safe = jnp.where(small, jnp.ones_like(theta), theta)
    one_m_cos = 1.0 - jnp.cos(safe)
    # Avoid 0/0 in the unselected branch when theta is exactly 0.
    one_m_cos = jnp.where(one_m_cos == 0.0, jnp.ones_like(one_m_cos), one_m_cos)
    a = jnp.where(small, 1.0 - theta * theta / 12.0,
                  0.5 * safe * jnp.sin(safe) / one_m_cos)
    b = 0.5 * theta
    ux = a * t[..., 0] + b * t[..., 1]
    uy = -b * t[..., 0] + a * t[..., 1]
    return jnp.stack([ux, uy, theta], axis=-1)
