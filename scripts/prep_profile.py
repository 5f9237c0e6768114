"""Fine-grained frame-prep stage timings on the real chip.

The round-3 kernel matrix (PERF.md) showed frame-minus-kernel =~ 16 ms of
prep at the bench config. This script attributes it: feature table,
footprints+keys, full binning, binning+gather, raygen, plus the window
sort-fire rate from the kernel's telemetry row.

Usage: python scripts/prep_profile.py [n_gauss]
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
from gaussian_ray_tracing_tpu.models.tiled import feature_table, tile_rays
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
from gaussian_ray_tracing_tpu.ops.tiles import (
    bin_pairs,
    num_tiles,
    project_footprints_conic,
)
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720
CAP = 1_441_792


def _cam(i):
    return Camera.create(eye=(0.002 * i, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                         width=WIDTH, height=HEIGHT)


def timed(stage_fn, k=8, repeats=3, args=()):
    def loop(kk):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, kk, lambda i, acc: acc + stage_fn(i, *a), 0.0))
        return lambda: f(*args)

    fk, f1 = loop(k), loop(1)
    float(fk()); float(f1())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter(); float(fk()); tk = time.perf_counter() - t0
        t0 = time.perf_counter(); float(f1()); t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    scene = jax.device_put(random_scene(n, seed=0))
    config = RenderConfig(hit_multiplicity=1, order="window", march_chunk=128)

    def table_only(i):
        cam = _cam(i)
        table, M, radius = feature_table(scene, config, eye=cam.eye)
        return table[::512, 0].sum() + M[0, 0, 0]

    def foot_keys(i):
        cam = _cam(i)
        table, M, radius = feature_table(scene, config, eye=cam.eye)
        bound_radius = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound_radius,
            cam, config)
        rel = scene.means - cam.eye
        rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
        hit, t_in, t_out = ray_ellipsoid_span(
            scene.means, M, radius, cam.eye, rel / rho[:, None])
        key = jnp.where(hit, jnp.where(t_in >= config.t_min, t_in, t_out), rho)
        return key.sum() + fp.px[::64].sum() + table[::512, 0].sum()

    def binning(i):
        cam = _cam(i)
        table, M, radius = feature_table(scene, config, eye=cam.eye)
        bound_radius = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound_radius,
            cam, config)
        rel = scene.means - cam.eye
        rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
        hit, t_in, t_out = ray_ellipsoid_span(
            scene.means, M, radius, cam.eye, rel / rho[:, None])
        key = jnp.where(hit, jnp.where(t_in >= config.t_min, t_in, t_out), rho)
        fp = fp._replace(depth=key)
        stream = bin_pairs(fp, cam, config, CAP,
                           geom=(scene.means, M.reshape(-1, 9), radius))
        return (stream.gid[::4096].astype(jnp.float32).mean()
                + stream.starts[-1].astype(jnp.float32))

    def bin_gather(i):
        stream, pair_feats, _, _ = prepare_pair_stream(
            scene, _cam(i), config, CAP, 128)
        return (pair_feats[::4096, 0].sum()
                + stream.starts[-1].astype(jnp.float32))

    def raygen(i):
        _, dirs, _ = generate_rays(_cam(i), config)
        dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
        return dirs_t.mean()

    rows = [
        ("feature_table", table_only),
        ("foot+keys+table", foot_keys),
        ("binning(all)", binning),
        ("binning+gather", bin_gather),
        ("raygen+tile", raygen),
    ]
    for name, fn in rows:
        print(f"{name:>16}: {timed(fn):7.2f} ms", flush=True)

    # ---- window sort-fire rate (kernel telemetry row) ----
    stream, pair_feats, _, _ = prepare_pair_stream(scene, _cam(0), config, CAP, 128)
    tx_n, ty_n = num_tiles(_cam(0), config)
    _, dirs, _ = generate_rays(_cam(0), config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
    _, _, (fires, repairs) = pallas_march_stream(
        stream.starts, jnp.asarray(_cam(0).eye, jnp.float32), pair_feats,
        dirs_t, config, n_tiles=tx_n * ty_n, rays_per_tile=256, chunk=128,
        stats=True)
    counts = jnp.diff(stream.starts)
    n_chunks = jnp.sum(-(-counts // 128))
    print(f"sort-fire: {int(jnp.sum(fires))} of {int(n_chunks)} chunks "
          f"({100 * float(jnp.sum(fires)) / max(1, int(n_chunks)):.1f}%); "
          f"span-repaired {int(jnp.sum(repairs))} "
          f"(sort_repair={config.sort_repair})",
          flush=True)


if __name__ == "__main__":
    main()
