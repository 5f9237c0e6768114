"""Renderer models: oracle (exact), tiled (fast), mesh tracer (bounces)."""

from gaussian_ray_tracing_tpu.models.oracle import render_oracle, render_rays_oracle
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.models.renderer import render, GaussianRayTracer

__all__ = [
    "render_oracle",
    "render_rays_oracle",
    "render_tiled",
    "render",
    "GaussianRayTracer",
]
