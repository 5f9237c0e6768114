"""Headline benchmark: forward Mrays/s/chip, pinhole 1280x720 (the
reference's default resolution, src/main.cpp:65-66) on a synthetic
trained-like 100k-gaussian scene (no trained PLY ships with the reference;
README.md:9 downloads one externally).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the fraction of the BASELINE.json north-star target of
1 Grays/s per chip (the reference publishes no numbers of its own,
BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
N_GAUSSIANS = 100_000
NORTH_STAR_MRAYS = 1000.0  # 1 Grays/s/chip (BASELINE.json)


def main():
    config = RenderConfig(hit_multiplicity=1)
    scene = random_scene(N_GAUSSIANS, seed=0)
    camera = Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=WIDTH, height=HEIGHT
    )

    method = "pallas" if config.use_pallas else "tiled"
    run = lambda: render(scene, camera, config, method=method)

    # warmup / compile
    out = run()
    jax.block_until_ready(out["rgb"])

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = run()
    jax.block_until_ready(out["rgb"])
    dt = (time.perf_counter() - t0) / n_iters

    mrays = WIDTH * HEIGHT / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"forward Mrays/s/chip (pinhole {WIDTH}x{HEIGHT}, "
                f"{N_GAUSSIANS} gaussians, {method})",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
