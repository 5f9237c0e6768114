"""Per-stage timing of the mesh-bounce frame on the real chip.

Decomposes render_with_mesh_fast's cost at the PERF.md configs (mirror
plane / glass sphere, 1280x720, 100k gaussians) into:

  prep      prepare_pair_stream + block index build (shared)
  tri       triangle closest-hit pass (cull + stream + Pallas kernel)
  march0    primary-segment march (screen-space pair stream, t_hi capped)
  cull1     bounce-1 block cull + stream
  march1    bounce-1 block march (per-ray origins, morton blocks)
  frame     the full render_with_mesh_fast frame

Each stage is timed with the fori-loop methodology (camera motion per
frame, 1-frame dispatch subtracted). Usage:
  python scripts/mesh_stages.py [mirror|glass] [--n 100000]
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
from gaussian_ray_tracing_tpu.config import MeshType, RenderConfig
from gaussian_ray_tracing_tpu.models.pallas_renderer import prepare_pair_stream
from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity, tile_rays
from gaussian_ray_tracing_tpu.ops.blocks import (
    block_stream,
    build_block_index,
    bundle_rays,
    cull_blocks,
)
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.ops.pallas_tri import (
    FACES_PER_BLOCK,
    face_block_index,
    pack_triangles,
    pallas_closest_hit,
)
from gaussian_ray_tracing_tpu.ops.tiles import num_tiles
from gaussian_ray_tracing_tpu.scene.mesh import make_plane, make_sphere
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

WIDTH, HEIGHT = 1280, 720


def timeit(make_frame, buffers=(), k=6, reps=2):
    """buffers: device arrays the frame reads — passed as jit ARGUMENTS
    (a zero-arg closure embeds them as program constants and the tunnel's
    remote_compile rejects the multi-hundred-MB request body with 413)."""
    loop = lambda n: jax.jit(
        lambda *bufs: jax.lax.fori_loop(
            0, n, lambda i, a: a + make_frame(i, *bufs), 0.0
        )
    )
    fk, f1 = loop(k), loop(1)
    v = float(fk(*buffers))
    assert v == v
    float(f1(*buffers))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fk(*buffers))
        tk = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f1(*buffers))
        t1 = time.perf_counter() - t0
        best = min(best, max((tk - t1) / (k - 1), 1e-9))
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", nargs="?", default="mirror",
                    choices=["mirror", "glass"])
    ap.add_argument("--n", type=int, default=100_000)
    args = ap.parse_args()

    config = RenderConfig(
        hit_multiplicity=1, order="window", march_chunk=128,
        mesh_type=MeshType.MIRROR if args.kind == "mirror" else MeshType.GLASS,
    )
    chunk = 128
    scene = jax.device_put(random_scene(args.n, seed=0))
    from gaussian_ray_tracing_tpu.config import MeshType as _MT

    mesh = (make_plane((0.0, 0.0, 0.5)).with_type(_MT.MIRROR)
            if args.kind == "mirror"
            else make_sphere((0.0, 0.0, 0.5)).with_type(_MT.GLASS))
    cap = default_pair_capacity(scene.num_gaussians)
    tx_n, ty_n = num_tiles(
        Camera.create(eye=(0, 0.3, 2.8), lookat=(0, 0, 0),
                      width=WIDTH, height=HEIGHT), config)
    n_tiles = tx_n * ty_n
    R = config.rays_per_tile
    block_capacity = (n_tiles * chunk * 16 // chunk) * chunk

    def cam(i):
        return Camera.create(
            eye=jnp.array([0.0, 0.3, 2.8]) + jnp.array([0.002, 0.0, 0.0]) * i,
            lookat=(0.0, 0.0, 0.0), width=WIDTH, height=HEIGHT)

    wv = mesh.world_vertices()
    faces = mesh.faces
    v0, v1, v2 = wv[faces[:, 0]], wv[faces[:, 1]], wv[faces[:, 2]]
    face_rows, tri_perm = pack_triangles(v0, v1, v2)
    findex = face_block_index(v0, v1, v2, tri_perm)
    n_fblocks = findex.centers.shape[0]
    face_capacity = n_tiles * FACES_PER_BLOCK * min(16, n_fblocks)

    def prep(i):
        c = cam(i)
        stream, pair_feats, table128, bound_radius = prepare_pair_stream(
            scene, c, config, cap, chunk)
        index = build_block_index(scene.means, bound_radius, block_size=chunk)
        # full-array reductions: a sampled slice would fuse INTO the gather
        # and time a fantasy (PERF.md round-3 DCE trap)
        return (stream.starts.sum() + pair_feats.sum()
                + index.centers.sum()).astype(jnp.float32)

    # shared per-frame pieces, built once outside the timed stages below
    c0 = cam(0)
    stream, pair_feats, table128, bound_radius = prepare_pair_stream(
        scene, c0, config, cap, chunk)
    index = build_block_index(scene.means, bound_radius, block_size=chunk)
    sorted_table = jnp.pad(table128[index.perm], ((0, chunk), (0, 0)))
    origins, dirs, valid = generate_rays(c0, config)
    d_t = tile_rays(dirs, config.tile_w, config.tile_h)
    o_t = jnp.broadcast_to(c0.eye, d_t.shape)
    # mirror-ish bounced dirs: reflect around +y as a stand-in workload
    d_b = d_t.at[..., 1].mul(-1.0)

    def tri(i, feats, table):
        d = d_t + 0.0 * i
        fbundles = bundle_rays(o_t, d)
        fvis = cull_blocks(findex, fbundles, config.mesh_t_max)
        fstream = block_stream(
            fvis, findex, fbundles, face_capacity,
            max_per_tile=max(1, face_capacity // (n_tiles * FACES_PER_BLOCK)))
        t_hit, fpk, hu, hv = pallas_closest_hit(
            fstream.starts, fstream.blk, face_rows, d, c0.eye,
            config.mesh_t_min, config.mesh_t_max, n_tiles, R, origins_t=o_t)
        return t_hit.sum() + fpk.sum()

    def march0(i, feats, table):
        d = d_t + 0.0 * i
        rgb_t, t_next = pallas_march_stream(
            stream.starts, c0.eye.astype(jnp.float32), feats, d,
            config, n_tiles=n_tiles, rays_per_tile=R, chunk=chunk, quad=True)
        return rgb_t.sum() + t_next.sum()

    def cull1(i, feats, table):
        d = d_b + 0.0 * i
        bundles = bundle_rays(o_t, d)
        visible = cull_blocks(index, bundles, jnp.full((n_tiles,), 6.0))
        bstream = block_stream(
            visible, index, bundles, block_capacity,
            max_per_tile=max(1, block_capacity // (n_tiles * chunk)))
        return bstream.starts.sum().astype(jnp.float32) + bstream.blk.sum()

    def march1(i, feats, table):
        d = d_b + 0.0 * i
        bundles = bundle_rays(o_t, d)
        visible = cull_blocks(index, bundles, jnp.full((n_tiles,), 6.0))
        bstream = block_stream(
            visible, index, bundles, block_capacity,
            max_per_tile=max(1, block_capacity // (n_tiles * chunk)))
        rgb_t, t_next = pallas_march_stream(
            bstream.starts, c0.eye.astype(jnp.float32), table, d,
            config, n_tiles=n_tiles, rays_per_tile=R, chunk=chunk,
            origins_t=o_t, block_offsets=bstream.blk)
        return rgb_t.sum() + t_next.sum()

    def frame(i, feats, table):
        from gaussian_ray_tracing_tpu.models.renderer import render
        return render(scene, cam(i), config, mesh=mesh)["rgb"].mean()

    bufs = (pair_feats, sorted_table)
    for name, fn in [("tri", tri), ("march0", march0),
                     ("cull1", cull1), ("march1", march1), ("frame", frame)]:
        ms = timeit(fn, bufs)
        print(f"{name:8s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
