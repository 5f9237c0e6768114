"""Multi-device / multi-host parallelism.

The reference is strictly single-GPU single-stream (one optixLaunch,
src/GaussianTracer.cpp:504,525); this layer is new capability mandated by
BASELINE.json config 5: rays/tiles sharded over a jax.sharding.Mesh
(data parallel), gaussians replicated or depth-slab partitioned with an
ordered segment combine (the ray-tracing analog of ring attention's
running-compositing trick), and gradients all-reduced over ICI.
"""

from gaussian_ray_tracing_tpu.parallel.mesh import make_mesh, ray_axis_sharding
from gaussian_ray_tracing_tpu.parallel.sharded import (
    render_tiled_sharded,
    render_rays_sharded_oracle,
    render_gaussian_sharded,
    render_pallas_slabs,
)

__all__ = [
    "make_mesh",
    "ray_axis_sharding",
    "render_tiled_sharded",
    "render_rays_sharded_oracle",
    "render_gaussian_sharded",
    "render_pallas_slabs",
]
