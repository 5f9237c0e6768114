"""Mesh-bounce frame timing on the real chip (VERDICT round-1 item 6).

Times the two PERF.md mesh rows — mirror plane (2 tris) and glass
180x90 UV sphere — at 1280x720 over the 100k synthetic scene, with the
same honest fori-loop methodology as bench.py (per-frame camera motion,
1-frame dispatch subtracted, min over repeats).

Usage: python scripts/mesh_probe.py [mirror glass] [--n 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import MeshType, RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.mesh import make_plane, make_sphere
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720


def time_frame(scene, mesh, config, k=6, reps=2):
    eye0 = jnp.array([0.0, 0.3, 2.8])
    lookat = jnp.zeros(3)

    def frame(i):
        cam = Camera.create(
            eye=eye0 + jnp.array([0.002, 0.0, 0.0]) * i, lookat=lookat,
            width=WIDTH, height=HEIGHT,
        )
        return render(scene, cam, config, mesh=mesh)["rgb"].mean()

    loop = lambda n: jax.jit(
        lambda: jax.lax.fori_loop(0, n, lambda i, a: a + frame(i), 0.0)
    )
    fk, f1 = loop(k), loop(1)
    v = float(fk())
    assert v == v, "non-finite render"
    float(f1())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(fk()); tk = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best


def main():
    global WIDTH, HEIGHT
    ap = argparse.ArgumentParser()
    ap.add_argument("cases", nargs="*", default=[])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    # bounce-regression bisect knobs (PERF.md 22e): toggle the round-5
    # march defaults one at a time against the r4 baseline behavior
    ap.add_argument("--chunk-skip", type=float, default=None,
                    help="override chunk_skip_transmittance (0 = r4 behavior)")
    ap.add_argument("--sort-repair", type=int, default=None,
                    help="override sort_repair width (0 = full bitonic, r4)")
    args = ap.parse_args()
    WIDTH, HEIGHT = args.width, args.height
    cases = args.cases or ["mirror", "glass"]

    scene = jax.device_put(random_scene(args.n, seed=0))
    config = RenderConfig(hit_multiplicity=1, order="window", march_chunk=128)
    if args.chunk_skip is not None:
        config = config.replace(chunk_skip_transmittance=args.chunk_skip)
    if args.sort_repair is not None:
        config = config.replace(sort_repair=args.sort_repair)
    for case in cases:
        if case == "mirror":
            mesh = make_plane((0.0, 0.0, 0.5)).with_type(MeshType.MIRROR)
        else:
            mesh = make_sphere((0.0, 0.0, 0.5)).with_type(MeshType.GLASS)
        dt = time_frame(scene, mesh, config)
        print(json.dumps({
            "case": case, "ms_per_frame": round(dt * 1e3, 1),
            "tris": int(mesh.num_faces),
            "resolution": f"{WIDTH}x{HEIGHT}", "n_gaussians": args.n,
            "backend": jax.default_backend(),
        }), flush=True)


if __name__ == "__main__":
    main()
