"""Scratch A/B: frustum_cull on/off at the bench config. Also reports
valid-pair counts so the cull's pair reduction is visible."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
N = 100_000
CAP = 1_600_000


def time_config(config, scene):
    method = "pallas" if jax.default_backend() == "tpu" else "tiled"

    def frame(i):
        camera = Camera.create(
            eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        out = render(scene, camera, config, method=method, pair_capacity=CAP)
        return out["rgb"].mean()

    def loop(k):
        return jax.jit(
            lambda: jax.lax.fori_loop(0, k, lambda i, a: a + frame(i), 0.0)
        )

    k = 8
    fk, f1 = loop(k), loop(1)
    float(fk())
    float(f1())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fk())
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best


def time_binning(config, scene):
    """Time prepare_pair_stream alone (binning + feature gather)."""
    from gaussian_ray_tracing_tpu.models.pallas_renderer import prepare_pair_stream

    def stage(i):
        camera = Camera.create(
            eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
            width=WIDTH, height=HEIGHT,
        )
        stream, pair_feats, _, _ = prepare_pair_stream(
            scene, camera, config, CAP, 256
        )
        return stream.key.astype(jnp.float32).mean() + pair_feats[::4096, 0].sum()

    def loop(k):
        return jax.jit(
            lambda: jax.lax.fori_loop(0, k, lambda i, a: a + stage(i), 0.0)
        )

    k = 8
    fk, f1 = loop(k), loop(1)
    float(fk())
    float(f1())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fk())
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1())
        t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best


def main():
    scene = jax.device_put(random_scene(N, seed=0))
    cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                        width=WIDTH, height=HEIGHT)
    for cull in (False, True):
        config = RenderConfig(hit_multiplicity=1, order="window",
                              march_chunk=256, exact_bbox=cull)
        method = "pallas" if jax.default_backend() == "tpu" else "tiled"
        aux = render(scene, cam, config, method=method, pair_capacity=CAP,
                     return_aux=True)["aux"]
        # count surviving pairs via the rendered aux if present
        dt = time_config(config, scene)
        db = time_binning(config, scene)
        mrays = WIDTH * HEIGHT / dt / 1e6
        print(f"cull={cull}: {dt*1e3:.1f} ms/frame ({db*1e3:.1f} ms binning), "
              f"{mrays:.2f} Mrays/s, "
              f"aux={ {k: int(v) for k, v in aux.items() if jnp.ndim(v) == 0} }")


if __name__ == "__main__":
    main()
