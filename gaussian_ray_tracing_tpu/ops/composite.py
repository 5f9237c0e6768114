"""Front-to-back alpha compositing over depth-ordered hits.

The reference composites sequentially inside its segment-march loop
(shaders/tracer.cuh:341-369):

    T = 1 - rayData.density
    for each hit in depth order:
        if T > minTransmittance and alpha > alpha_min:
            radiance += T * color * alpha
            T *= (1 - alpha)

Here the same recurrence is evaluated in parallel with an exclusive cumulative
product, which is bit-equivalent in the contributions it produces: T is
monotonically nonincreasing, so the plain gated cumprod P_i agrees with the
sequential T_i everywhere the per-hit weight is nonzero, and the sequential
early-termination value of T is recovered from the first index where the
inclusive cumprod crosses the threshold.
"""

from __future__ import annotations

import jax.numpy as jnp


def effective_alpha(resp: jnp.ndarray, opacity: jnp.ndarray, alpha_clamp: float = 0.99):
    """Per-hit alpha min(clamp, response*opacity) (shaders/tracer.cuh:356-357)."""
    return jnp.minimum(alpha_clamp, resp * opacity)


def composite_depth_ordered(
    alphas: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    alpha_min: float,
    min_transmittance: float,
    hit_multiplicity: int = 1,
    t0: jnp.ndarray | None = None,
):
    """Composite hits sorted front-to-back along the last axis.

    Args:
      alphas: (..., M) per-hit alpha (already clamped via effective_alpha).
      colors: (..., M, 3) per-hit radiance.
      valid:  (..., M) bool mask for real hits.
      alpha_min: contribution cutoff (hit skipped, T unchanged, if
        alpha <= alpha_min; tracer.cuh:361).
      min_transmittance: early-termination threshold on T (tracer.cuh:341,353).
      hit_multiplicity: 1 for standard volume rendering; 2 reproduces the
        reference's double hull-hit compositing at coincident depths
        (see RenderConfig.hit_multiplicity): m passes with the same alpha
        compose to weight 1-(1-a)^m. Exact except at the single hit where T
        crosses min_transmittance: the reference re-checks T between the two
        passes (shaders/tracer.cuh:353) while the closed form applies both,
        a deviation bounded by min_transmittance (below 8-bit quantization).
      t0: (...,) optional carry-in transmittance (1 - rayData.density when a
        segment continues a previous one across a mesh bounce).

    Returns:
      rgb:     (..., 3) accumulated radiance of this segment.
      density: (...,) 1 - T_final (sequential semantics incl. early stop).
      t_final: (...,) final transmittance (carry out to the next segment).
    """
    gate = valid & (alphas > alpha_min)
    if hit_multiplicity == 1:
        a_eff = alphas
    else:
        a_eff = 1.0 - (1.0 - alphas) ** hit_multiplicity
    a = jnp.where(gate, a_eff, 0.0)
    one_minus = 1.0 - a
    p_incl = jnp.cumprod(one_minus, axis=-1)
    p_excl = jnp.concatenate(
        [jnp.ones_like(p_incl[..., :1]), p_incl[..., :-1]], axis=-1
    )
    if t0 is not None:
        p_incl = p_incl * t0[..., None]
        p_excl = p_excl * t0[..., None]
        t_start = t0
    else:
        t_start = jnp.ones(p_incl.shape[:-1], p_incl.dtype)

    w = a * p_excl * (p_excl > min_transmittance)
    rgb = jnp.sum(w[..., None] * colors, axis=-2)

    # Sequential early-termination transmittance: the first inclusive value at
    # or below the threshold freezes T (T is nonincreasing, so that value is
    # the max among those <= threshold).
    below = p_incl <= min_transmittance
    frozen = jnp.max(jnp.where(below, p_incl, -jnp.inf), axis=-1)
    if p_incl.shape[-1] > 0:
        t_last = p_incl[..., -1]
    else:
        t_last = t_start
    t_final = jnp.where(jnp.any(below, axis=-1), frozen, t_last)
    # Rays whose carry-in already terminated contribute nothing and keep t0.
    t_final = jnp.where(t_start > min_transmittance, t_final, t_start)
    rgb = jnp.where((t_start > min_transmittance)[..., None], rgb, 0.0)
    density = 1.0 - t_final
    return rgb, density, t_final
