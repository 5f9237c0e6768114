"""March-KERNEL-only cost matrix on the real chip.

Times pallas_march_stream alone (fixed pair stream, per-iteration ray
regeneration, bench methodology) across the knobs that change only kernel
math — {quad on/off} x {order key/window/merge} x {sh_degree 0/3} x
{chunk} — to attribute march milliseconds to: response math (quad),
per-ray ordering networks (order), and SH radiance evaluation (sh).

sh_degree=0 rows rebuild the table/config at degree 0 (same pairs: the
footprints don't depend on SH), so (sh3 - sh0) is the pure SH eval cost.

Usage: python scripts/march_matrix.py [n_gauss]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.pallas_renderer import prepare_pair_stream
from gaussian_ray_tracing_tpu.models.tiled import tile_rays
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.ops.tiles import num_tiles
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
CAP = 1_441_792  # drop-free for the 100k bench scene, cull off


def _cam(i):
    return Camera.create(
        eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT,
    )


def timed_loop(stage_fn, k=8, repeats=3, args=()):
    def loop(kk):
        f = jax.jit(
            lambda *a: jax.lax.fori_loop(
                0, kk, lambda i, acc: acc + stage_fn(i, *a), 0.0
            )
        )
        return lambda: f(*args)

    fk, f1 = loop(k), loop(1)
    float(fk()); float(f1())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(fk()); tk = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    scene = jax.device_put(random_scene(n, seed=0))
    tw = th = 16

    rows = [
        ("key    q1 sh3 c128 p16", dict(order="key", packed16=True), 3, True, 128),
        ("key    q1 sh3 c128 f32", dict(order="key", packed16=False), 3, True, 128),
        ("window q1 sh3 c128 p16", dict(order="window", packed16=True), 3, True, 128),
        ("window q1 sh3 c128 f32", dict(order="window", packed16=False), 3, True, 128),
        ("merge  q1 sh3 c64  p16", dict(order="merge", packed16=True), 3, True, 64),
    ]

    streams = {}
    for name, okw, sh_deg, quad, chunk in rows:
        config = RenderConfig(
            hit_multiplicity=1, march_chunk=chunk, conic_cull=False,
            sh_degree=sh_deg, **okw,
        )
        skey = (sh_deg, config.packed16)
        if skey not in streams:
            stream, pair_feats, _, _ = prepare_pair_stream(
                scene, _cam(0), config, CAP, 256, packed16=config.packed16
            )
            assert int(stream.n_dropped) == 0, int(stream.n_pairs)
            streams[skey] = (
                jax.device_put(stream.starts), jax.device_put(pair_feats),
                int(stream.n_pairs),
            )
        starts, pair_feats, n_pairs = streams[skey]
        tx_n, ty_n = num_tiles(_cam(0), config)
        eye = jnp.asarray(_cam(0).eye, jnp.float32)

        def march(i, starts_, feats_, config=config, chunk=chunk,
                  quad=quad, tx_n=tx_n, ty_n=ty_n, eye=eye):
            _, dirs, _ = generate_rays(_cam(i), config)
            dirs_t = tile_rays(dirs, tw, th)
            rgb_t, _ = pallas_march_stream(
                starts_, eye, feats_, dirs_t, config,
                n_tiles=tx_n * ty_n, rays_per_tile=tw * th, chunk=chunk,
                interpret=False, quad=quad, packed16=config.packed16,
            )
            return rgb_t.mean()

        dt = timed_loop(march, args=(starts, pair_feats))
        print(f"{name}: {dt * 1e3:7.2f} ms  (pairs {n_pairs})", flush=True)


if __name__ == "__main__":
    main()
