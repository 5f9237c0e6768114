"""Fused Pallas closest-hit kernel over morton-ordered triangle blocks.

The reference's second OptiX IAS (reflection primitives,
src/GaussianTracer.cpp:578-651) becomes the same block-streaming design as
the gaussian march: triangles are morton-ordered by centroid and packed
8-per-128-lane-row; consecutive 256-face blocks carry bounding spheres;
per frame each 16x16 pixel tile's ray bundle cone-culls the blocks
(ops/blocks.py) and one grid program per tile streams only the surviving
blocks HBM->VMEM, intersecting 8 face slots x 32 sublane rows against the
tile's 256 rays per block (scalarized Moller-Trumbore, double-sided as in
the reference: no cull flags, src/GaussianTracer.cpp:355-360).

Replaces a brute-force XLA sweep that was HBM-bound on (rays, faces)
intermediates (1.07 s/call for 921k rays x 32k faces; see PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FACES_PER_ROW = 8  # 16-column slots: [v0 xyz, e1 xyz, e2 xyz, 7 pad]
ROWS_PER_BLOCK = 32  # 256 faces per block
FACES_PER_BLOCK = FACES_PER_ROW * ROWS_PER_BLOCK
_MISS = 3.0e38


def pack_triangles(v0, v1, v2):
    """Morton-order faces by centroid and pack into (rows, 128) f32.

    Returns (face_rows, perm) where perm maps packed face id -> original
    face index (for normals lookup)."""
    import numpy as np

    from gaussian_ray_tracing_tpu.ops.blocks import morton_codes

    F = v0.shape[0]
    cent = (v0 + v1 + v2) / 3.0
    perm = jnp.argsort(morton_codes(cent))
    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    e1 = v1 - v0
    e2 = v2 - v0
    feat = jnp.concatenate(
        [v0, e1, e2, jnp.zeros((F, 7), v0.dtype)], axis=1
    )  # (F, 16)
    pad = (-F) % FACES_PER_BLOCK
    if pad:
        feat = jnp.concatenate([feat, jnp.zeros((pad, 16), feat.dtype)], 0)
    rows = feat.reshape(-1, FACES_PER_ROW * 16)  # (rows, 128)
    return rows, perm


def face_block_index(v0, v1, v2, perm):
    """Bounding spheres of consecutive 256-face (morton-ordered) blocks,
    as an ops.blocks.BlockIndex (block_size in face slots)."""
    from gaussian_ray_tracing_tpu.ops.blocks import BlockIndex

    v0, v1, v2 = v0[perm], v1[perm], v2[perm]
    F = v0.shape[0]
    pad = (-F) % FACES_PER_BLOCK
    if pad:
        last = lambda a: jnp.concatenate([a, jnp.repeat(a[-1:], pad, 0)], 0)
        v0, v1, v2 = last(v0), last(v1), last(v2)
    nb = v0.shape[0] // FACES_PER_BLOCK
    pts = jnp.stack([v0, v1, v2], 1).reshape(nb, FACES_PER_BLOCK * 3, 3)
    centers = 0.5 * (jnp.min(pts, axis=1) + jnp.max(pts, axis=1))
    radii = jnp.max(jnp.linalg.norm(pts - centers[:, None, :], axis=-1), axis=1)
    return BlockIndex(
        perm=perm, centers=centers, radii=radii, block_size=FACES_PER_BLOCK
    )


def _tri_kernel(
    starts_ref,  # prefetch (T+1,) int32 face-slot segment starts (multiples of 256)
    eye_ref,  # prefetch (3,) f32 shared ray origin (primary bounce)
    blocks_ref,  # prefetch (cap_b,) int32 block ids per chunk slot
    rows_hbm,  # (rows_pad, 128) packed faces
    dirs_ref,  # (1, 8, R): rows 0..2 dir xyz
    *rest,  # [orig_ref (1,8,R) rows 0..2 origin xyz] out_ref acc fbuf sems
    t_min: float,
    t_max: float,
    R: int,
    per_ray_origin: bool,
):
    if per_ray_origin:
        orig_ref, out_ref, acc, fbuf, sems = rest
    else:
        out_ref, acc, fbuf, sems = rest
        orig_ref = None
    t = pl.program_id(0)
    start = starts_ref[t]
    n_chunks = pl.cdiv(starts_ref[t + 1] - start, FACES_PER_BLOCK)
    f32 = jnp.float32

    dirs = dirs_ref[0]
    dx, dy, dz = dirs[0:1, :], dirs[1:2, :], dirs[2:3, :]  # (1, R)
    if per_ray_origin:
        orow = orig_ref[0]
        ox, oy, oz = orow[0:1, :], orow[1:2, :], orow[2:3, :]
    else:
        ox, oy, oz = eye_ref[0], eye_ref[1], eye_ref[2]

    acc[0:1, :] = jnp.full((1, R), _MISS, f32)  # best t
    acc[1:2, :] = jnp.full((1, R), -1.0, f32)  # best face id
    acc[2:4, :] = jnp.zeros((2, R), f32)  # u, v

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_BLOCK, 1), 0)

    def get_dma(slot, j):
        ofs = blocks_ref[start // FACES_PER_BLOCK + j] * ROWS_PER_BLOCK
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(ofs, ROWS_PER_BLOCK), :], fbuf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_chunks)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        g = fbuf[slot]  # (32, 128)
        blk = blocks_ref[start // FACES_PER_BLOCK + j]

        for s in range(FACES_PER_ROW):
            col = lambda k: g[:, 16 * s + k : 16 * s + k + 1]  # (32, 1)
            v0x, v0y, v0z = col(0), col(1), col(2)
            e1x, e1y, e1z = col(3), col(4), col(5)
            e2x, e2y, e2z = col(6), col(7), col(8)

            # p = d x e2  -> (32, R)
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv = 1.0 / jnp.where(ok, det, 1.0)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            eps = 1e-6
            # degenerate padding faces have zero edges => det ~ 0 => no hit
            hit = (
                ok & (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps)
                & (tt > t_min) & (tt < t_max)
            )
            tm = jnp.where(hit, tt, _MISS)
            fid = (blk * FACES_PER_BLOCK + row_iota * FACES_PER_ROW + s).astype(f32)

            tmin_s = jnp.min(tm, axis=0, keepdims=True)  # (1, R)
            eq = tm == tmin_s
            fid_s = jnp.min(jnp.where(eq, fid, 3.0e38), axis=0, keepdims=True)
            sel = eq & (fid == fid_s)  # unique argmin (ties -> smallest id)
            u_s = jnp.sum(jnp.where(sel, u, 0.0), axis=0, keepdims=True)
            v_s = jnp.sum(jnp.where(sel, v, 0.0), axis=0, keepdims=True)

            better = tmin_s < acc[0:1, :]
            acc[0:1, :] = jnp.where(better, tmin_s, acc[0:1, :])
            acc[1:2, :] = jnp.where(better, fid_s, acc[1:2, :])
            acc[2:3, :] = jnp.where(better, u_s, acc[2:3, :])
            acc[3:4, :] = jnp.where(better, v_s, acc[3:4, :])
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)
    out_ref[0] = acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "t_max", "n_tiles", "rays_per_tile", "interpret"),
)
def pallas_closest_hit(
    starts: jnp.ndarray,  # (T+1,) int32, multiples of 256
    blocks: jnp.ndarray,  # (cap_b,) int32 block id per chunk slot
    face_rows: jnp.ndarray,  # (rows_pad, 128)
    dirs_t: jnp.ndarray,  # (T, R, 3)
    eye: jnp.ndarray,  # (3,)
    t_min: float,
    t_max: float,
    n_tiles: int,
    rays_per_tile: int,
    origins_t: jnp.ndarray | None = None,
    interpret: bool = False,
):
    """Per-tile closest hit over culled face blocks.

    Returns (t (T,R) with +inf misses, face (T,R) int32 PACKED face ids with
    -1 misses, u (T,R), v (T,R))."""
    R = rays_per_tile
    dirs_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
    dirs_pack = dirs_pack.at[:, 0:3, :].set(jnp.transpose(dirs_t, (0, 2, 1)))
    per_ray_origin = origins_t is not None
    inputs = [starts, eye.astype(jnp.float32), blocks, face_rows, dirs_pack]
    ray_specs = [
        pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    ]
    if per_ray_origin:
        orig_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
        orig_pack = orig_pack.at[:, 0:3, :].set(jnp.transpose(origins_t, (0, 2, 1)))
        inputs.append(orig_pack)
        ray_specs.append(
            pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _tri_kernel, t_min=t_min, t_max=t_max, R=R, per_ray_origin=per_ray_origin
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY), *ray_specs],
        out_specs=pl.BlockSpec(
            (1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((8, R), jnp.float32),
            pltpu.VMEM((2, ROWS_PER_BLOCK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, R), jnp.float32),
        interpret=interpret,
    )(*inputs)
    t = jnp.where(out[:, 0, :] >= _MISS, jnp.inf, out[:, 0, :])
    face = jnp.where(
        out[:, 1, :] < 0.0, -1, out[:, 1, :].astype(jnp.int32)
    )
    return t, face, out[:, 2, :], out[:, 3, :]
