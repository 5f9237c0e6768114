"""TPU-native differentiable 3D Gaussian ray tracer (JAX/Pallas).

A from-scratch reimplementation of the *capabilities* of the CUDA/OptiX
reference ``Ray-Studio2/gaussian-ray-tracing`` (3DGRT), redesigned for TPU:
sort-based tile rendering + fused Pallas march/composite kernels instead of
hardware BVH traversal, a differentiable backward pass (the reference has
none), and multi-host scaling over a ``jax.sharding.Mesh``.

Layout:
  config        — every reference constant as a config field
  scene/        — PLY/OBJ IO, Gaussian SoA scene, triangle meshes, synthetic scenes
  cameras       — pinhole + fisheye ray generation (reference parity)
  ops/          — pure math: quaternions, SH, max-response, intersections,
                  compositing, morton codes, tile binning; Pallas kernels
  models/       — renderers: oracle (exact), tiled (fast), mesh tracer (bounces),
                  trainable GaussianModel
  parallel/     — device-mesh sharding: ray DP, depth-slab gaussian partitioning
  train/        — losses, optimizer, train step, checkpointing
  utils/        — image IO, PSNR, timing, logging
"""

import os as _os

import jax as _jax

# Persistent compilation cache: first Mosaic/XLA compile of the fused march
# kernel takes minutes on tunneled TPU backends; cache it across processes.
if not _os.environ.get("GRT_TPU_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/grt_tpu_jax_cache"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort; never block import
        pass

from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.cameras import Camera

__version__ = "0.1.0"

__all__ = ["RenderConfig", "GaussianScene", "Camera", "__version__"]
