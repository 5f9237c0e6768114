"""Morton-block acceleration structure for arbitrary (secondary) rays.

The reference traces bounced rays through the same OptiX BVH as primary rays
(shaders/tracer.cu:59-106). Primary rays get the screen-space pair stream
(ops/tiles.py) — but bounced rays have arbitrary origins/directions, so this
module provides the camera-independent analog, built once per scene:

  1. gaussians are sorted along a 30-bit Morton curve (spatial locality);
  2. consecutive runs of `block_size` sorted gaussians form blocks with
     precomputed bounding spheres — a flat, two-level "LBVH-lite" whose
     leaves are contiguous feature-table ranges (so the march kernel's
     chunk DMAs stay contiguous, no per-candidate gather);
  3. per frame/bounce, each 16x16-pixel TILE of bounced rays is bounded by
     an origin sphere + direction cone, blocks are culled against it
     (a tiny dense (tiles x blocks) test), survivors are distance-sorted,
     and expanded into the same per-tile candidate stream the fused Pallas
     march consumes (ops/pallas_march.py) with per-ray origins/windows.

Ordering: blocks are processed in distance-from-bundle order and the
kernel's in-chunk per-ray bitonic window sort (order="window") recovers
per-ray front-to-back order within each block-sized chunk.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BlockIndex(NamedTuple):
    """Per-scene Morton-block index (camera independent)."""

    perm: jnp.ndarray  # (N,) morton order of the original gaussians
    centers: jnp.ndarray  # (B, 3) block bounding-sphere centers
    radii: jnp.ndarray  # (B,) block bounding-sphere radii
    block_size: int


def morton_codes(points: jnp.ndarray, bits: int = 10) -> jnp.ndarray:
    """30-bit Morton codes of points quantized inside their AABB."""
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = (points - lo) / jnp.maximum(hi - lo, 1e-12)
    cells = jnp.clip((q * (1 << bits)).astype(jnp.int32), 0, (1 << bits) - 1)

    def spread(v):
        # interleave 10 bits with two zero gaps (x -> x_9 0 0 x_8 0 0 ...)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (
        spread(cells[:, 0])
        | (spread(cells[:, 1]) << 1)
        | (spread(cells[:, 2]) << 2)
    )


def build_block_index(
    means: jnp.ndarray,
    bound_radius: jnp.ndarray,
    block_size: int = 256,
) -> BlockIndex:
    """Morton-sort gaussians and bound each `block_size` run by a sphere.

    bound_radius: per-gaussian bounding-sphere radius of the adaptive iso
    ellipsoid (radius * max(scale), src/GaussianTracer.cpp:306 semantics).
    """
    n = means.shape[0]
    code = morton_codes(means)
    perm = jnp.argsort(code)
    pad = (-n) % block_size
    means_s = means[perm]
    rad_s = bound_radius[perm]
    if pad:
        means_s = jnp.concatenate([means_s, jnp.repeat(means_s[-1:], pad, 0)], 0)
        rad_s = jnp.concatenate([rad_s, jnp.zeros((pad,), rad_s.dtype)], 0)
    nb = means_s.shape[0] // block_size
    mb = means_s.reshape(nb, block_size, 3)
    rb = rad_s.reshape(nb, block_size)
    centers = 0.5 * (jnp.min(mb, axis=1) + jnp.max(mb, axis=1))
    radii = jnp.max(
        jnp.linalg.norm(mb - centers[:, None, :], axis=-1) + rb, axis=1
    )
    return BlockIndex(perm=perm, centers=centers, radii=radii, block_size=block_size)


class RayBundles(NamedTuple):
    """Per-tile conservative bounds of a bounced-ray set."""

    o_c: jnp.ndarray  # (T, 3) origin-sphere centers
    o_r: jnp.ndarray  # (T,) origin-sphere radii
    axis: jnp.ndarray  # (T, 3) cone axis (unit)
    cos_half: jnp.ndarray  # (T,) cosine of cone half angle
    any_live: jnp.ndarray  # (T,) bool


def bundle_rays(origins_t: jnp.ndarray, dirs_t: jnp.ndarray) -> RayBundles:
    """Bound each tile's live rays (|d| > 0.1) by origin sphere + dir cone.

    All (T, R)-sized math is per-component (no trailing length-3 axis on
    big intermediates — XLA lane-pads the minor axis to 128, PERF.md
    fact 1); only the (T, 3) outputs keep the vector layout."""
    ox, oy, oz = origins_t[..., 0], origins_t[..., 1], origins_t[..., 2]
    dx, dy, dz = dirs_t[..., 0], dirs_t[..., 1], dirs_t[..., 2]
    live = dx * dx + dy * dy + dz * dz > 0.01  # (T, R)
    nlive = jnp.maximum(jnp.sum(live, axis=-1), 1).astype(origins_t.dtype)
    lw = live.astype(origins_t.dtype)
    ocx = jnp.sum(ox * lw, axis=1) / nlive  # (T,)
    ocy = jnp.sum(oy * lw, axis=1) / nlive
    ocz = jnp.sum(oz * lw, axis=1) / nlive
    r2 = (
        (ox - ocx[:, None]) ** 2
        + (oy - ocy[:, None]) ** 2
        + (oz - ocz[:, None]) ** 2
    )
    o_r = jnp.sqrt(jnp.max(jnp.where(live, r2, 0.0), axis=-1))
    dsx = jnp.sum(dx * lw, axis=1)  # (T,)
    dsy = jnp.sum(dy * lw, axis=1)
    dsz = jnp.sum(dz * lw, axis=1)
    dn = jnp.maximum(jnp.sqrt(dsx * dsx + dsy * dsy + dsz * dsz), 1e-9)
    ax, ay, az = dsx / dn, dsy / dn, dsz / dn
    cosd = dx * ax[:, None] + dy * ay[:, None] + dz * az[:, None]
    cos_half = jnp.min(jnp.where(live, cosd, 1.0), axis=-1)
    return RayBundles(
        o_c=jnp.stack([ocx, ocy, ocz], axis=-1),
        o_r=o_r,
        axis=jnp.stack([ax, ay, az], axis=-1),
        cos_half=jnp.clip(cos_half, -1.0, 1.0),
        any_live=jnp.any(live, axis=-1),
    )


def cull_blocks(
    index: BlockIndex,
    bundles: RayBundles,
    t_max,
) -> jnp.ndarray:
    """(T, B) bool: block sphere potentially intersects the bundle's cone.

    Conservative cone-vs-sphere with the origin sphere folded into the
    block radius: visible iff the angle from the cone axis to the block
    center is within half_angle + asin(expanded_radius / dist), the block
    is not entirely behind the bundle, and within t_max.

    t_max: scalar, or a (T,) per-tile cap (e.g. the tile's max live-ray
    segment end from a mesh hit — glass interior segments are short, so a
    per-tile cap culls everything beyond the exit surface).
    """
    # per-component (T, B) math — a (T, B, 3) intermediate would lane-pad
    # the trailing 3 to 128 (PERF.md fact 1: 42x memory)
    vx = index.centers[None, :, 0] - bundles.o_c[:, None, 0]  # (T, B)
    vy = index.centers[None, :, 1] - bundles.o_c[:, None, 1]
    vz = index.centers[None, :, 2] - bundles.o_c[:, None, 2]
    dist = jnp.sqrt(vx * vx + vy * vy + vz * vz)  # (T, B)
    rr = index.radii[None, :] + bundles.o_r[:, None]
    inside = dist <= rr
    along = (
        vx * bundles.axis[:, None, 0]
        + vy * bundles.axis[:, None, 1]
        + vz * bundles.axis[:, None, 2]
    )
    cos_to = along / jnp.maximum(dist, 1e-9)
    ang_to = jnp.arccos(jnp.clip(cos_to, -1.0, 1.0))
    half = jnp.arccos(bundles.cos_half)[:, None]
    delta = jnp.arcsin(jnp.clip(rr / jnp.maximum(dist, 1e-9), 0.0, 1.0))
    in_cone = ang_to <= (half + delta)
    forward = (along + rr) > 0.0
    t_cap = jnp.asarray(t_max)
    if t_cap.ndim == 1:
        t_cap = t_cap[:, None]
    near = (dist - rr) <= t_cap
    return (inside | (in_cone & forward & near)) & bundles.any_live[:, None]


class BlockStream(NamedTuple):
    blk: jnp.ndarray  # (cap_b,) int32 block id of each chunk slot (kernel
    #   block mode: chunk j of tile t streams block blk[starts[t]//bs + j])
    starts: jnp.ndarray  # (T+1,) int32 per-tile segment starts (gaussian slots)
    n_slots: jnp.ndarray  # () int32 slots needed (pre-clip)
    n_dropped: jnp.ndarray  # () int32 slots lost to capacity


def block_stream(
    visible: jnp.ndarray,  # (T, B)
    index: BlockIndex,
    bundles: RayBundles,
    capacity: int,
    max_per_tile: int | None = None,
) -> BlockStream:
    """Expand culled blocks into a per-tile candidate stream over the
    morton-SORTED gaussian ids, blocks ordered near-to-far per tile.

    max_per_tile: optional per-tile block budget. Blocks beyond it are the
    FARTHEST of that tile (the order is near-to-far), which front-to-back
    early termination makes the least likely to contribute — strictly
    better than the capacity clip alone, which starves whole later tiles.
    With capacity >= T * max_per_tile * block_size the capacity clip then
    never fires at all."""
    T, B = visible.shape
    bs = index.block_size
    cap_b = capacity // bs  # expansion runs at block granularity (bs x smaller)
    dist = jnp.sqrt(
        (index.centers[None, :, 0] - bundles.o_c[:, None, 0]) ** 2
        + (index.centers[None, :, 1] - bundles.o_c[:, None, 1]) ** 2
        + (index.centers[None, :, 2] - bundles.o_c[:, None, 2]) ** 2
    )
    keys = jnp.where(visible, dist, jnp.inf)
    order = jnp.argsort(keys, axis=-1).astype(jnp.int32)  # (T, B) near-to-far
    counts_b = jnp.sum(visible, axis=-1).astype(jnp.int32)  # (T,)
    n_clipped = jnp.int32(0)
    if max_per_tile is not None and max_per_tile < B:
        clipped = jnp.minimum(counts_b, max_per_tile)
        n_clipped = jnp.sum(counts_b - clipped)
        counts_b = clipped
    starts_b = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_b).astype(jnp.int32)]
    )
    total_b = starts_b[-1]

    # owner tile of each BLOCK slot: scatter-max + cummax (see ops/tiles.py)
    tids = jnp.arange(T, dtype=jnp.int32)
    first = jnp.minimum(starts_b[:-1], cap_b)
    buf = jnp.zeros((cap_b + 1,), jnp.int32).at[first].max(tids + 1)
    towner = jax.lax.cummax(buf[:cap_b]) - 1
    slot_b = jnp.arange(cap_b, dtype=jnp.int32)
    valid_b = (slot_b < jnp.minimum(total_b, cap_b)) & (towner >= 0)
    towner_safe = jnp.maximum(towner, 0)
    rank_b = slot_b - starts_b[towner_safe]
    blk = order.reshape(-1)[towner_safe * B + jnp.clip(rank_b, 0, B - 1)]
    blk = jnp.where(valid_b, blk, 0)
    return BlockStream(
        blk=blk,
        starts=starts_b * bs,
        n_slots=total_b * bs,
        n_dropped=(jnp.maximum(total_b - cap_b, 0) + n_clipped) * bs,
    )
