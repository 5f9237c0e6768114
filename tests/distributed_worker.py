"""Worker for tests/test_distributed.py: one of two cooperating processes.

Each process owns 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device world, and the SAME sharded renderer code that runs
single-process drives the global mesh (gloo collectives across processes).

Usage: python distributed_worker.py <process_id> <port> <out.npy>
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from gaussian_ray_tracing_tpu.parallel.distributed import (
        fetch,
        global_scene,
        initialize_distributed,
    )

    initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    from jax.sharding import Mesh

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.parallel.mesh import RAY_AXIS
    from gaussian_ray_tracing_tpu.parallel.sharded import render_tiled_sharded
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    mesh = Mesh(np.asarray(jax.devices()), (RAY_AXIS,))
    scene = global_scene(random_scene(500, seed=2), mesh)
    cam = Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=64, height=64
    )
    cfg = RenderConfig(hit_multiplicity=1, order="key")
    out = render_tiled_sharded(scene, cam, cfg, mesh, pair_capacity=40_000)
    rgb = fetch(out["rgb"])
    if pid == 0:
        np.save(out_path, rgb)
    print(f"[{pid}] ok {rgb.shape} {float(np.asarray(rgb).sum()):.6f}", flush=True)


if __name__ == "__main__":
    main()
