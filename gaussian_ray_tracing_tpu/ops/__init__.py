"""Pure math ops for the Gaussian ray tracer (vectorized, jit-friendly)."""

from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat, normalize_quat
from gaussian_ray_tracing_tpu.ops.sh import eval_sh, SH_C0
from gaussian_ray_tracing_tpu.ops.response import (
    canonical_frames,
    adaptive_radius,
    max_response,
    ray_ellipsoid_span,
)
from gaussian_ray_tracing_tpu.ops.composite import composite_depth_ordered, effective_alpha

__all__ = [
    "quat_to_rotmat",
    "normalize_quat",
    "eval_sh",
    "SH_C0",
    "canonical_frames",
    "adaptive_radius",
    "max_response",
    "ray_ellipsoid_span",
    "composite_depth_ordered",
    "effective_alpha",
]
