"""Native (C++) host-runtime core with pure-Python fallbacks."""

from gaussian_ray_tracing_tpu.native.bindings import (
    available,
    build,
    morton3d,
    argsort_u64,
    ply_read_native,
    obj_load_native,
)

__all__ = [
    "available",
    "build",
    "morton3d",
    "argsort_u64",
    "ply_read_native",
    "obj_load_native",
]
