"""Frame-level A/B of the 3-zone row-span expansion on the real chip.

row_span shrinks the emitted pair count (~18% on synthetic scenes), so
every O(P) stage shrinks with it — but only if the pair capacity is
re-snugged per setting (a fixed cap would hide the win in the sort,
fills and gather). Bench scene, window/128, fori-loop methodology.

Usage: python scripts/ab_rowspan.py [n_gauss]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720


def snug_cap(scene, cam, config, method):
    from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity

    cap = default_pair_capacity(scene.num_gaussians)
    for _ in range(3):
        aux = render(scene, cam, config, method=method, pair_capacity=cap,
                     return_aux=True)["aux"]
        n, d = int(aux["n_pairs"]), int(aux["n_dropped"])
        want = -(-int(n * 1.2) // 65536) * 65536
        if d == 0:
            return max(want, 65536), n
        cap = max(want, cap * 2)
    raise AssertionError("no drop-free capacity")


def time_config(config, scene, cap, method):
    def frame(i):
        cam = Camera.create(eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=WIDTH, height=HEIGHT)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    scene = jax.device_put(random_scene(n, seed=0))
    cam0 = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT)
    for name, kw in [
        ("rowspan=1", dict(row_span=True, order="window")),
        ("rowspan=1 key", dict(row_span=True, order="key")),
        ("rowspan=0 key", dict(row_span=False, order="key")),
    ]:
        cfg = RenderConfig(hit_multiplicity=1, march_chunk=128, **kw)
        cap, n_pairs = snug_cap(scene, cam0, cfg, method)
        dt = time_config(cfg, scene, cap, method)
        mrays = WIDTH * HEIGHT / dt / 1e6
        print(f"{name}: {dt * 1e3:7.2f} ms  {mrays:7.2f} Mrays/s"
              f"  (pairs {n_pairs}, cap {cap})", flush=True)


if __name__ == "__main__":
    main()
