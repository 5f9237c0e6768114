"""PSNR vs the exact oracle for march ordering variants (CPU, interpret).

Measures what each ordering approximation costs on the adversarial
high-overlap synthetic scene (the scene class the bench uses), at 96x64:

  window/event c=128   round-1 parity config (~42.6 dB)
  window/peak  c=128   t* ordering + sqrt/div-free gate
  merge/event  c=64    cross-chunk merge (VERDICT round-1 item 1a)
  merge/peak   c=64    merge + t* ordering
  window/event c=64    known ~38 dB (below parity bar)

Usage: python scripts/order_quality.py [n_gauss] [--size WxH]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.utils.image import psnr

VARIANTS = [
    ("window/event c=128", dict(order="window", window_key="event"), 128),
    ("window/peak  c=128", dict(order="window", window_key="peak"), 128),
    ("merge/event  c=64 ", dict(order="merge", window_key="event"), 64),
    ("merge/peak   c=64 ", dict(order="merge", window_key="peak"), 64),
    ("merge/event  c=128", dict(order="merge", window_key="event"), 128),
    ("window/event c=64 ", dict(order="window", window_key="event"), 64),
    ("key          c=128", dict(order="key"), 128),
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    w, h = 96, 64
    scene = random_scene(n, seed=3)
    cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                        width=w, height=h)
    base = RenderConfig(hit_multiplicity=1)
    ref = np.asarray(render(scene, cam, base, method="oracle")["rgb"])
    for name, kw, chunk in VARIANTS:
        t0 = time.time()
        cfg = base.replace(march_chunk=chunk, **kw)
        out = np.asarray(render(scene, cam, cfg, method="pallas")["rgb"])
        print(f"{name}: {float(psnr(ref, out)):6.2f} dB"
              f"   ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
