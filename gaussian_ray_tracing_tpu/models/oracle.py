"""Brute-force oracle renderer (pure JAX, exact per-ray depth ordering).

O(N_gaussians * N_rays): every ray tests every gaussian, sorts hits by its own
entry depth, and composites front-to-back. This is the ground-truth renderer
every accelerated path is validated against (BASELINE.json config 1:
"CPU-runnable ref"), mirroring the semantics of the reference's OptiX
traversal + k-buffer march (shaders/tracer.cuh:328-373) without any
acceleration structure.

Hit rule (replacing the icosahedron proxy-hull hits,
src/GaussianTracer.cpp:297-317): a gaussian produces a hit event at its iso
ellipsoid entry t, or at its exit t when the ray starts inside / the entry
lies before the segment start — exactly the face OptiX would report within
[t_lo, t_hi]. Alphas use the analytic max response along the full ray
(shaders/tracer.cuh:187-214), which is independent of the segment clipping,
as in the reference.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.ops.composite import composite_depth_ordered, effective_alpha
from gaussian_ray_tracing_tpu.ops.response import (
    adaptive_radius,
    canonical_frames,
    max_response,
    ray_ellipsoid_span,
)
from gaussian_ray_tracing_tpu.ops.sh import eval_sh
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene


def hit_events(means, M, radius, origins, dirs, t_lo, t_hi):
    """Per (ray, gaussian) hit event time within [t_lo, t_hi].

    Returns (event_valid, t_event). t_lo/t_hi broadcast against the ray dims.
    """
    hit, t_entry, t_exit = ray_ellipsoid_span(means, M, radius, origins, dirs)
    use_exit = t_entry < t_lo
    t_event = jnp.where(use_exit, t_exit, t_entry)
    valid = hit & (t_event >= t_lo) & (t_event <= t_hi)
    return valid, t_event


def render_rays_oracle(
    scene: GaussianScene,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    config: RenderConfig,
    t_lo=None,
    t_hi=None,
    t0: jnp.ndarray | None = None,
    ray_chunk: int = 4096,
):
    """Render a flat batch of rays against every gaussian.

    Args:
      origins, dirs: (R, 3); dirs normalized (zero => dead ray).
      t_lo, t_hi: segment bounds, scalar or (R,); default config.t_min/t_max.
      t0: optional carry-in transmittance (R,).
      ray_chunk: rays per inner step (bounds the (chunk, N) working set).

    Returns:
      rgb (R, 3), density (R,), t_final (R,)
    """
    R = origins.shape[0]
    t_lo = jnp.broadcast_to(
        jnp.asarray(config.t_min if t_lo is None else t_lo, jnp.float32), (R,)
    )
    t_hi = jnp.broadcast_to(
        jnp.asarray(config.t_max if t_hi is None else t_hi, jnp.float32), (R,)
    )
    t0 = jnp.ones((R,), jnp.float32) if t0 is None else t0

    M = canonical_frames(scene.scales, scene.quats)  # (N, 3, 3)
    radius = adaptive_radius(scene.opacities, config.alpha_min)  # (N,)

    pad = (-R) % ray_chunk
    if pad:
        zeros3 = jnp.zeros((pad, 3), origins.dtype)
        origins = jnp.concatenate([origins, zeros3], 0)
        dirs = jnp.concatenate([dirs, zeros3], 0)
        t_lo = jnp.concatenate([t_lo, jnp.ones((pad,), jnp.float32)], 0)
        t_hi = jnp.concatenate([t_hi, jnp.zeros((pad,), jnp.float32)], 0)
        t0 = jnp.concatenate([t0, jnp.ones((pad,), jnp.float32)], 0)

    def chunk_fn(args):
        o, d, lo, hi, tt0 = args
        # (C, 1, 3) rays vs (N, 3) gaussians -> (C, N)
        oC = o[:, None, :]
        dC = d[:, None, :]
        valid, t_event = hit_events(scene.means, M, radius, oC, dC, lo[:, None], hi[:, None])
        resp, _ = max_response(scene.means, M, oC, dC)
        alpha = effective_alpha(resp, scene.opacities, config.alpha_clamp)
        color = eval_sh(scene.sh, dC, config.sh_degree)
        # degree 0 is view-independent: broadcast up to (C, N, 3)
        color = jnp.broadcast_to(color, alpha.shape + (3,))
        live = jnp.sum(d * d, axis=-1) > 0.01  # |dir| > 0.1 guard (tracer.cu:59)
        valid = valid & live[:, None]

        key = jnp.where(valid, t_event, jnp.inf)
        order = jnp.argsort(key, axis=-1)
        alpha_s = jnp.take_along_axis(alpha, order, axis=-1)
        valid_s = jnp.take_along_axis(valid, order, axis=-1)
        color_s = jnp.take_along_axis(color, order[..., None], axis=-2)
        rgb, density, t_final = composite_depth_ordered(
            alpha_s,
            color_s,
            valid_s,
            alpha_min=config.alpha_min,
            min_transmittance=config.min_transmittance,
            hit_multiplicity=config.hit_multiplicity,
            t0=tt0,
        )
        return rgb, density, t_final

    n_chunks = origins.shape[0] // ray_chunk
    reshape = lambda x: x.reshape((n_chunks, ray_chunk) + x.shape[1:])
    rgb, density, t_final = jax.lax.map(
        chunk_fn, (reshape(origins), reshape(dirs), reshape(t_lo), reshape(t_hi), reshape(t0))
    )
    flat = lambda x: x.reshape((-1,) + x.shape[2:])[:R]
    return flat(rgb), flat(density), flat(t_final)


@partial(jax.jit, static_argnames=("config", "ray_chunk"))
def render_oracle(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    ray_chunk: int = 4096,
):
    """Full-frame primary-ray render (no mesh bounces).

    Returns dict with rgb (H, W, 3) float in [0,1] pre-quantization and
    alpha (H, W).  Invalid (fisheye r>1) pixels are black, matching the
    reference's output-buffer memset (src/GaussianTracer.cpp:510-513).
    """
    origins, dirs, valid = generate_rays(camera, config)
    H, W = dirs.shape[:2]
    rgb, density, _ = render_rays_oracle(
        scene, origins.reshape(-1, 3), dirs.reshape(-1, 3), config, ray_chunk=ray_chunk
    )
    rgb = jnp.clip(rgb.reshape(H, W, 3), 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, density.reshape(H, W), 0.0)
    return {"rgb": rgb, "alpha": alpha}
