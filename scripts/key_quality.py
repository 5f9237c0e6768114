"""CPU quality probe: PSNR vs the exact oracle for key orderings.

Usage: JAX_PLATFORMS=cpu python scripts/key_quality.py [--n 3000] [--wh 96x64]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3000)
    ap.add_argument("--wh", default="96x64")
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--hm", type=int, default=1)
    ap.add_argument("--method", default="tiled")
    args = ap.parse_args()
    W, H = (int(x) for x in args.wh.split("x"))

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.models.oracle import render_oracle
    from gaussian_ray_tracing_tpu.models.renderer import render
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    scene = random_scene(args.n, seed=0)
    cam = Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=W, height=H
    )
    ref = np.asarray(
        render_oracle(scene, cam, RenderConfig(hit_multiplicity=args.hm))["rgb"]
    )
    print("oracle done", flush=True)

    def psnr(a):
        mse = float(np.mean((np.asarray(a) - ref) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for keys in ("gaussian", "affine", "tile_peak", "tile"):
        for order in ("key", "window"):
            cfg = RenderConfig(
                hit_multiplicity=args.hm, order=order,
                march_chunk=args.chunk, pair_keys=keys,
            )
            out = render(scene, cam, cfg, method=args.method)["rgb"]
            print(f"{keys:9s} {order:7s} PSNR={psnr(out):6.2f}", flush=True)


if __name__ == "__main__":
    main()
