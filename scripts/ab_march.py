"""A/B sweep of the round-2 march/bin optimizations on the real chip.

Sweeps the bench scene (pinhole 1280x720, 100k synthetic gaussians)
across the new knobs so the winning parity-grade config can be pinned
in bench.py with measured evidence:

  conic_cull on/off          exact per-pair conic-vs-tile-rect cull
  order window/merge/key     cross-chunk streaming merge vs window sort
  window_key event/peak      sqrt/div-free gate + t* ordering
  march_chunk 64/128

Pair capacity is re-snugged per cull setting (the cull shrinks the
stream; a fixed capacity would understate its win). Quality numbers for
the same grid come from scripts/order_quality.py (CPU, vs exact oracle).

Usage: python scripts/ab_march.py [n_gauss]
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

VARIANTS = [
    # CPU oracle PSNR at 96x64 (scripts/order_quality.py, seed-3 scene):
    # window/128 50.1 dB, merge/128 58.2, merge/64 53.1, merge/32 43.1,
    # window/64 42.2, key 30.3. window_key="peak" is quality-dead (~25 dB:
    # the oracle composites in EVENT order) — not swept.
    ("window/event c=128 cull=0", dict(order="window", march_chunk=128, conic_cull=False)),
    ("window/event c=128 cull=1", dict(order="window", march_chunk=128)),
    ("merge/event  c=64  cull=0", dict(order="merge", march_chunk=64, conic_cull=False)),
    ("merge/event  c=64  cull=1", dict(order="merge", march_chunk=64)),
    ("merge/event  c=32  cull=1", dict(order="merge", march_chunk=32)),
    ("merge/event  c=128 cull=1", dict(order="merge", march_chunk=128)),
    ("window/event c=64  cull=1", dict(order="window", march_chunk=64)),
    ("key          c=128 cull=1", dict(order="key", march_chunk=128)),
]


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
    caps = {}
    for name, kw in VARIANTS:
        cfg = RenderConfig(hit_multiplicity=1, **kw)
        ckey = cfg.conic_cull
        if ckey not in caps:
            caps[ckey] = snug_cap(scene, cam0, cfg, method)
        cap, n_pairs = caps[ckey]
        dt = time_config(cfg, scene, cap, method)
        mrays = WIDTH * HEIGHT / dt / 1e6
        print(f"{name}: {dt * 1e3:7.2f} ms  {mrays:7.2f} Mrays/s"
              f"  (pairs {n_pairs}, cap {cap})", flush=True)


if __name__ == "__main__":
    main()
