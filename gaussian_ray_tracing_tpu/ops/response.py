"""Ray--Gaussian max-response math.

Reimplements (from the math, not the code) the response model of
computeResponse (shaders/tracer.cuh:187-214) and the adaptive proxy scale of
createGaussianParticlesBVH (src/GaussianTracer.cpp:306):

  M      = S^-1 R^T                       (canonical whitening frame)
  o_g    = M (o - mu),  d_g = M d
  t*     = -<o_g, d_g> / max(1e-6, <d_g, d_g>)
  resp   = exp(-1/2 |o_g + t* d_g|^2)
  radius = sqrt(2 ln(opacity / alpha_min))  (iso-surface where resp*opacity
                                             drops to alpha_min)

All functions broadcast: arrange ray dims against gaussian dims freely, e.g.
rays (R, 1, 3) against gaussians (N, 3).
"""

from __future__ import annotations

import jax.numpy as jnp

from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat


def canonical_frames(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """M = diag(1/s) @ R^T, shape (..., 3, 3).

    Rows of M are R's columns scaled by 1/s_i; applying M maps world offsets
    into the gaussian's unit-isotropic canonical space.
    """
    R = quat_to_rotmat(quats)  # (..., 3, 3)
    inv_s = 1.0 / scales  # (..., 3)
    # M[i, j] = inv_s[i] * R[j, i]  (diag(1/s) @ R^T)
    return inv_s[..., :, None] * jnp.swapaxes(R, -1, -2)


def adaptive_radius(
    opacity: jnp.ndarray, alpha_min: float, clamp_min: float = 0.0
) -> jnp.ndarray:
    """Canonical-space iso radius sqrt(2 ln(opacity/alpha_min)).

    Particles with opacity <= alpha_min can never pass the alpha_min hit test
    (alpha = resp*opacity <= alpha_min since resp <= 1), so their radius is
    clamped to `clamp_min` (0 => degenerate, never intersected) instead of
    producing NaNs like the reference's unguarded sqrt(log(...)) would.
    """
    ratio = jnp.maximum(opacity / alpha_min, 1.0)
    x = 2.0 * jnp.log(ratio)
    # sqrt has infinite slope at 0: guard the primal AND the tangent so
    # opacity gradients stay finite at the opacity <= alpha_min clamp
    # (autodiff of sqrt(where(...)) is the standard safe pattern)
    safe = jnp.sqrt(jnp.where(x > 0.0, x, 1.0))
    return jnp.maximum(jnp.where(x > 0.0, safe, 0.0), clamp_min)


def _mat3_apply(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) @ (..., 3) -> (..., 3) with broadcasting."""
    return jnp.einsum("...ij,...j->...i", M, v)


def max_response(
    means: jnp.ndarray,
    M: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
):
    """Peak response of each (ray, gaussian) pair.

    Returns:
      resp:   exp(-1/2 |o_g + t* d_g|^2), in (0, 1]
      t_star: parameter of the peak along the (unnormalized) ray
    """
    o_g = _mat3_apply(M, origins - means)
    d_g = _mat3_apply(M, dirs)
    dd = jnp.sum(d_g * d_g, axis=-1)
    od = jnp.sum(o_g * d_g, axis=-1)
    t_star = -od / jnp.maximum(dd, 1e-6)
    p = o_g + t_star[..., None] * d_g
    resp = jnp.exp(-0.5 * jnp.sum(p * p, axis=-1))
    return resp, t_star


def ray_ellipsoid_span(
    means: jnp.ndarray,
    M: jnp.ndarray,
    radius: jnp.ndarray,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
):
    """Entry/exit parameters of a ray against the iso ellipsoid |M(x-mu)|=r.

    This is the analytic TPU-native replacement for the reference's
    icosahedron proxy-hull hits (the hull only exists to feed OptiX's
    triangle pipeline; src/GaussianTracer.cpp:297-317): the quadratic
      |o_g + t d_g|^2 = r^2.

    Returns:
      hit:     bool, discriminant >= 0 and radius > 0
      t_entry: smaller root (may be negative: origin inside / behind)
      t_exit:  larger root
    """
    o_g = _mat3_apply(M, origins - means)
    d_g = _mat3_apply(M, dirs)
    a = jnp.maximum(jnp.sum(d_g * d_g, axis=-1), 1e-12)
    b = jnp.sum(o_g * d_g, axis=-1)  # half-b
    c = jnp.sum(o_g * o_g, axis=-1) - radius * radius
    disc = b * b - a * c
    hit = (disc >= 0.0) & (radius > 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_entry = (-b - sq) / a
    t_exit = (-b + sq) / a
    return hit, t_entry, t_exit
