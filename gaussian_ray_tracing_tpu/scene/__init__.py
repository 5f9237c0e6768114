"""Scene data: Gaussian particle sets, triangle meshes, PLY/OBJ IO."""

from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.scene.mesh import TriangleMesh, make_plane, make_sphere, load_obj
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

__all__ = [
    "GaussianScene",
    "TriangleMesh",
    "make_plane",
    "make_sphere",
    "load_obj",
    "random_scene",
]
