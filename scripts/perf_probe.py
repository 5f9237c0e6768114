"""Stage-level perf probe on the real chip (bench config unless overridden).

Usage: python scripts/perf_probe.py [stage ...] [--chunk N] [--order window|key]
                                    [--tile WxH] [--n N] [--cap P]

Stages: frame binning gather march  (default: all)

Timing methodology matches bench.py: K executions inside one jitted
fori_loop with per-iteration camera motion, minus a 1-iteration dispatch,
min over repeats (tunnel jitter is strictly additive).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.pallas_renderer import (
    prepare_pair_stream,
    render_pallas,
)
from gaussian_ray_tracing_tpu.models.tiled import tile_rays
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.ops.tiles import (
    bin_pairs,
    num_tiles,
    project_footprints_conic,
)
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720


def _cam(i):
    return Camera.create(
        eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
        width=WIDTH, height=HEIGHT,
    )


def timed_loop(stage_fn, k=8, repeats=3, args=()):
    """stage_fn(i, *args) -> scalar; big device arrays go through `args`
    (jit arguments, not captured constants: the axon tunnel caps the
    compile-request size)."""
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
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="*", default=[])
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--order", default="window")
    ap.add_argument("--tile", default="16x16")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--cap", type=int, default=1_216_000)
    ap.add_argument("--hm", type=int, default=1)
    ap.add_argument("--keys", default="gaussian")
    args = ap.parse_args()
    stages = args.stages or ["frame", "binning", "gather", "march"]
    tw, th = (int(x) for x in args.tile.split("x"))

    config = RenderConfig(
        hit_multiplicity=args.hm, order=args.order, march_chunk=args.chunk,
        tile_w=tw, tile_h=th, pair_keys=args.keys,
    )
    scene = jax.device_put(random_scene(args.n, seed=0))
    cap = args.cap
    chunk = args.chunk

    out = render_pallas(scene, _cam(0), config, pair_capacity=cap,
                        chunk=chunk, return_aux=True)
    aux = out["aux"]
    print(f"pairs={int(aux['n_pairs'])} dropped={int(aux['n_dropped'])} "
          f"rgb_mean={float(out['rgb'].mean()):.4f}")
    assert int(aux["n_dropped"]) == 0

    results = {}

    if "frame" in stages:
        def frame(i):
            return render_pallas(scene, _cam(i), config, pair_capacity=cap,
                                 chunk=chunk)["rgb"].mean()
        results["frame"] = timed_loop(frame)

    if "binning" in stages:
        def binning(i):
            camera = _cam(i)
            from gaussian_ray_tracing_tpu.models.tiled import feature_table
            from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
            table, M, radius = feature_table(scene, config)
            bound_radius = radius * jnp.max(scene.scales, axis=-1)
            fp = project_footprints_conic(
                scene.means, scene.scales, scene.quats, radius, bound_radius,
                camera, config)
            rel = scene.means - camera.eye
            rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
            hit, t_in, t_out = ray_ellipsoid_span(
                scene.means, M, radius, camera.eye, rel / rho[:, None])
            key = jnp.where(t_in >= config.t_min, t_in, t_out)
            key = jnp.where(hit, key, rho)
            fp = fp._replace(depth=key)
            stream = bin_pairs(fp, camera, config, cap,
                               geom=(scene.means, M.reshape(-1, 9), radius))
            return (stream.key[::4096].astype(jnp.float32).mean()
                    + stream.starts[-1].astype(jnp.float32))
        results["binning"] = timed_loop(binning)

    if "gather" in stages:
        def bin_gather(i):
            stream, pair_feats, _, _ = prepare_pair_stream(
                scene, _cam(i), config, cap, chunk)
            return (pair_feats[::4096, 0].sum()
                    + stream.starts[-1].astype(jnp.float32))
        results["binning+gather"] = timed_loop(bin_gather)

    if "march" in stages:
        # fixed stream, varying dirs: times the kernel alone
        stream, pair_feats, _, _ = prepare_pair_stream(
            scene, _cam(0), config, cap, chunk)
        stream = jax.device_put(stream)
        pair_feats = jax.device_put(pair_feats)
        tx_n, ty_n = num_tiles(_cam(0), config)
        eye = jnp.asarray(_cam(0).eye, jnp.float32)

        def march(i, starts, feats):
            _, dirs, _ = generate_rays(_cam(i), config)
            dirs_t = tile_rays(dirs, tw, th)
            rgb_t, _ = pallas_march_stream(
                starts, eye, feats, dirs_t, config,
                n_tiles=tx_n * ty_n, rays_per_tile=tw * th, chunk=chunk,
                interpret=False)
            return rgb_t.mean()
        results["raygen+march"] = timed_loop(
            march, args=(stream.starts, pair_feats))

        def raygen(i):
            _, dirs, _ = generate_rays(_cam(i), config)
            dirs_t = tile_rays(dirs, tw, th)
            return dirs_t.mean()
        results["raygen"] = timed_loop(raygen)

    rays = WIDTH * HEIGHT
    for name, dt in results.items():
        extra = f"  ({rays / dt / 1e6:.1f} Mrays/s)" if name == "frame" else ""
        print(f"{name:>16}: {dt * 1e3:7.2f} ms{extra}")


if __name__ == "__main__":
    main()
