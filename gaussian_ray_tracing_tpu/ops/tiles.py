"""Tile binning: the TPU-native acceleration structure.

Where the reference builds an OptiX two-level BVH over per-particle
icosahedron proxy hulls and traverses it per ray
(src/GaussianTracer.cpp:297-317, shaders/tracer.cu:124-153), the TPU design
is sort-based and data-parallel: every gaussian's conservative screen
footprint is binned into fixed-size pixel tiles, (tile, depth) pairs are
sorted once per frame with a stable two-pass sort, and each tile ends up
with a depth-ordered, fixed-capacity candidate list that the march kernel
streams through VMEM.

The footprint is a bounding sphere of the adaptive iso-ellipsoid
(radius_canonical * max(scale), with radius_canonical =
sqrt(2 ln(opacity/alpha_min)) — src/GaussianTracer.cpp:306), so culling is
conservative: the exact per-ray alpha_min test in the march (equivalent to
the ellipsoid hit test by construction of the adaptive radius) discards
false positives.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig


class TileBinning(NamedTuple):
    """Per-tile depth-sorted candidate lists."""

    cand: jnp.ndarray  # (T, M_cap) int32 gaussian ids, -1 = empty
    counts: jnp.ndarray  # (T,) int32 candidates per tile (clipped to M_cap)
    big: jnp.ndarray  # (B_cap,) int32 ids of footprints wider than the span
    #   cap (incl. camera-enclosing gaussians) — merged into EVERY tile's
    #   list by the renderer so nothing is silently cropped; depth-sorted
    n_pairs: jnp.ndarray  # () int32 total emitted pairs
    n_dropped: jnp.ndarray  # () int32 pairs lost to capacity overflow


class Footprint(NamedTuple):
    px: jnp.ndarray  # (N,) pixel-space center x
    py: jnp.ndarray  # (N,) pixel-space center y
    rx: jnp.ndarray  # (N,) conservative pixel half-extent x
    ry: jnp.ndarray  # (N,) conservative pixel half-extent y
    depth: jnp.ndarray  # (N,) front-to-back sort key
    visible: jnp.ndarray  # (N,) bool


_MARGIN = 1.1  # multiplicative footprint safety margin
_EPS = 1e-6


def project_footprints(
    means: jnp.ndarray,
    bound_radius: jnp.ndarray,
    camera: Camera,
    config: RenderConfig,
) -> Footprint:
    """Conservative screen-space footprints of bounding spheres."""
    U, V, W = camera.uvw_frame()
    ulen = jnp.linalg.norm(U)
    vlen = jnp.linalg.norm(V)
    wlen = jnp.linalg.norm(W)
    u_hat, v_hat, w_hat = U / ulen, V / vlen, W / wlen

    rel = means - camera.eye
    a = rel @ (-u_hat)
    b = rel @ (-v_hat)
    c = rel @ w_hat
    Wpx, Hpx = camera.width, camera.height

    if config.camera_model == CameraModel.PINHOLE:
        # ndc_x = (a / c) * |W|/|U| (camera basis is orthogonal; raygen dir =
        # dx*(-U) + dy*(-V) + W, shaders/tracer.cuh:133)
        z = jnp.maximum(c, _EPS)
        ndc_x = a / z * (wlen / ulen)
        ndc_y = b / z * (wlen / vlen)
        px = (ndc_x + 1.0) * 0.5 * Wpx
        py = (ndc_y + 1.0) * 0.5 * Hpx
        z_near = jnp.maximum(c - bound_radius, _EPS)
        rx = bound_radius / z_near * (wlen / ulen) * 0.5 * Wpx
        ry = bound_radius / z_near * (wlen / vlen) * 0.5 * Hpx
        visible = (c + bound_radius) > _EPS
        depth = c
    elif config.camera_model == CameraModel.FISHEYE:
        rho = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        rho_safe = jnp.maximum(rho, _EPS)
        cos_t = jnp.clip(c / rho_safe, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        f = config.fisheye_focal
        r_ndc = 2.0 * f * jnp.sin(0.5 * theta)
        planar = jnp.sqrt(jnp.maximum(a * a + b * b, _EPS * _EPS))
        ndc_x = r_ndc * a / planar
        ndc_y = r_ndc * b / planar
        px = (ndc_x + 1.0) * 0.5 * Wpx
        py = (ndc_y + 1.0) * 0.5 * Hpx
        # angular radius of the bounding sphere; sqrt(2)*f bounds the ndc
        # stretch of the equisolid map for theta <= pi/2
        delta = jnp.arcsin(jnp.clip(bound_radius / rho_safe, 0.0, 1.0))
        inside = rho <= bound_radius
        r_fp = jnp.where(inside, 4.0, jnp.sqrt(2.0) * f * delta)
        rx = r_fp * 0.5 * Wpx
        ry = r_fp * 0.5 * Hpx
        # visible hemisphere: r <= 1 <=> theta <= pi/2 (tracer.cuh:155-159)
        visible = (theta - delta) <= (0.5 * jnp.pi + 0.05)
        depth = rho
    else:
        raise ValueError(config.camera_model)

    rx = rx * _MARGIN + 1.0
    ry = ry * _MARGIN + 1.0
    visible = visible & (bound_radius > 0.0)
    return Footprint(px, py, rx, ry, depth, visible)


def bin_tiles(
    fp: Footprint,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
) -> TileBinning:
    """Scatter footprints into per-tile depth-sorted candidate lists."""
    tw, th = config.tile_w, config.tile_h
    tx_n = -(-camera.width // tw)
    ty_n = -(-camera.height // th)
    n_tiles = tx_n * ty_n
    span = config.max_tile_span
    m_cap = config.max_per_tile
    n = fp.px.shape[0]

    # float-clip tile bounds before the int cast (projected centers of
    # near/behind-camera gaussians can be astronomically large)
    fclip = lambda v, n_t: jnp.clip(v, -2.0, n_t + 1.0)
    fx0 = jnp.floor(fclip((fp.px - fp.rx) / tw, tx_n)).astype(jnp.int32)
    fx1 = jnp.floor(fclip((fp.px + fp.rx) / tw, tx_n)).astype(jnp.int32)
    fy0 = jnp.floor(fclip((fp.py - fp.ry) / th, ty_n)).astype(jnp.int32)
    fy1 = jnp.floor(fclip((fp.py + fp.ry) / th, ty_n)).astype(jnp.int32)
    # off-screen cull
    on = (fx1 >= 0) & (fy1 >= 0) & (fx0 < tx_n) & (fy0 < ty_n) & fp.visible
    x0 = jnp.clip(fx0, 0, tx_n - 1)
    x1 = jnp.clip(fx1, 0, tx_n - 1)
    y0 = jnp.clip(fy0, 0, ty_n - 1)
    y1 = jnp.clip(fy1, 0, ty_n - 1)
    # footprints wider than the span cap in either axis go to the broadcast
    # ("big") list instead of being cropped — they are merged into every
    # tile's candidates by the renderer
    is_big = on & (((x1 - x0 + 1) > span) | ((y1 - y0 + 1) > span))
    on = on & ~is_big
    sw = x1 - x0 + 1
    sh = y1 - y0 + 1
    count = jnp.where(on, sw * sh, 0)

    offsets = jnp.cumsum(count) - count
    total = offsets[-1] + count[-1] if n else jnp.int32(0)

    sentinel_tile = jnp.int32(n_tiles)
    tiles_buf = jnp.full((pair_capacity + 1,), sentinel_tile, jnp.int32)
    depth_buf = jnp.zeros((pair_capacity + 1,), jnp.float32)
    gid_buf = jnp.full((pair_capacity + 1,), -1, jnp.int32)
    gids = jnp.arange(n, dtype=jnp.int32)

    def emit(k, bufs):
        tiles_b, depth_b, gid_b = bufs
        ok = k < count
        kx = k % sw
        ky = k // sw
        tile = (y0 + ky) * tx_n + (x0 + kx)
        pos = jnp.where(ok, jnp.minimum(offsets + k, pair_capacity), pair_capacity)
        tiles_b = tiles_b.at[pos].set(jnp.where(ok, tile, sentinel_tile))
        depth_b = depth_b.at[pos].set(fp.depth)
        gid_b = gid_b.at[pos].set(gids)
        return tiles_b, depth_b, gid_b

    tiles_buf, depth_buf, gid_buf = jax.lax.fori_loop(
        0, span * span, emit, (tiles_buf, depth_buf, gid_buf)
    )
    tiles_buf = tiles_buf[:pair_capacity]
    depth_buf = depth_buf[:pair_capacity]
    gid_buf = gid_buf[:pair_capacity]

    # stable two-pass sort => (tile, depth) lexicographic order
    perm1 = jnp.argsort(depth_buf, stable=True)
    tiles1 = tiles_buf[perm1]
    perm2 = jnp.argsort(tiles1, stable=True)
    perm = perm1[perm2]
    tiles_sorted = tiles1[perm2]
    gid_sorted = gid_buf[perm]

    starts = jnp.searchsorted(tiles_sorted, jnp.arange(n_tiles + 1, dtype=jnp.int32))
    counts_t = jnp.diff(starts)
    clipped = jnp.minimum(counts_t, m_cap)

    slots = jnp.arange(m_cap, dtype=jnp.int32)
    pos = starts[:n_tiles, None] + slots[None, :]
    valid = slots[None, :] < clipped[:, None]
    cand = jnp.where(valid, gid_sorted[jnp.clip(pos, 0, pair_capacity - 1)], -1)

    # broadcast list: big footprints, depth-sorted, bounded capacity
    b_cap = config.big_capacity
    big_key = jnp.where(is_big, fp.depth, jnp.inf)
    big_order = jnp.argsort(big_key)[:b_cap]
    big = jnp.where(is_big[big_order], big_order.astype(jnp.int32), -1)
    n_big = jnp.sum(is_big.astype(jnp.int32))
    big_dropped = jnp.maximum(n_big - b_cap, 0)

    cap_dropped = jnp.maximum(total - pair_capacity, 0) + jnp.sum(counts_t - clipped)
    return TileBinning(
        cand=cand,
        counts=clipped,
        big=big,
        n_pairs=total,
        n_dropped=cap_dropped + big_dropped,
    )
