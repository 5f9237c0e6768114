"""Quick headline-only A/B: bench scene, pinhole 720p, configurable knobs.

Usage: python scripts/quick_ab.py cfg_kwargs_json ...
e.g.   python scripts/quick_ab.py '{"tile_h": 8}' '{}'
Each arg is a bare JSON dict of RenderConfig overrides over the bench
config (no label= prefix).
"""

from __future__ import annotations

import json
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


def snug(scene, cam, config, method):
    from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity

    cap = default_pair_capacity(scene.num_gaussians)
    for _ in range(4):
        aux = render(scene, cam, config, method=method, pair_capacity=cap,
                     return_aux=True)["aux"]
        n, d = int(aux["n_pairs"]), int(aux["n_dropped"])
        want = -(-int(n * 1.2) // 65536) * 65536
        if d == 0:
            return max(want, 65536), n
        cap = max(want, cap * 2)
    raise AssertionError("no drop-free capacity")


def time_config(config, scene, cap, method, w=WIDTH, h=HEIGHT):
    # the snug cap was verified drop-free at the probe camera only; assert
    # the animation's last (max-displacement) camera also drops nothing —
    # silent pair drops during timed frames would fake a speedup
    last = Camera.create(eye=(0.002 * 7, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                         width=w, height=h)
    aux = render(scene, last, config, method=method, pair_capacity=cap,
                 return_aux=True)["aux"]
    assert int(aux["n_dropped"]) == 0, f"drops at animated camera: {aux}"

    def frame(i):
        cam = Camera.create(eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=w, height=h)
        return render(scene, cam, config, method=method,
                      pair_capacity=cap)["rgb"].mean()

    def loop(k):
        return jax.jit(
            lambda: jax.lax.fori_loop(0, k, lambda i, a: a + frame(i), 0.0))

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
    from gaussian_ray_tracing_tpu.config import CameraModel

    method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    scene = jax.device_put(random_scene(100_000, seed=0))
    base = dict(hit_multiplicity=1, order="window", march_chunk=128)
    variants = [json.loads(a) for a in sys.argv[1:]] or [{}]
    for ov in variants:
        # JSON can't carry the enum: {"camera_model": "fisheye"} etc.
        if isinstance(ov.get("camera_model"), str):
            ov = {**ov, "camera_model": CameraModel(ov["camera_model"])}
        config = RenderConfig(**{**base, **ov})
        w, h = (WIDTH, HEIGHT)
        if config.camera_model == CameraModel.FISHEYE:
            w, h = 768, 768  # the bench fisheye row's frame
        cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=w, height=h)
        cap, n_pairs = snug(scene, cam, config, method)
        dt = time_config(config, scene, cap, method, w, h)
        mrays = w * h / dt / 1e6
        label = json.dumps({k: getattr(v, "value", v) for k, v in ov.items()})
        print(f"{label:50s} cap={cap:8d} pairs={n_pairs:8d} "
              f"{dt * 1e3:7.2f} ms  {mrays:6.2f} Mrays/s", flush=True)


if __name__ == "__main__":
    main()
