"""Tile-culled fast renderer (pure JAX; the Pallas kernel mirrors this).

Per frame: conservative screen footprints -> (tile, depth) pair sort ->
per-tile depth-ordered candidate lists (ops/tiles.py) -> a chunked
march/composite over each tile's candidates with a running-transmittance
carry, which reproduces the reference's segment-march compositing
(shaders/tracer.cuh:328-373) exactly (see ops/composite.py).

Semantics notes vs the oracle:
  - hits are gated by the exact per-ray iso-ellipsoid event (equivalent to
    the alpha_min test by construction of the adaptive radius) AND the
    [t_min, t_max] window, like the oracle;
  - ordering within a tile uses the per-gaussian view depth rather than each
    ray's own entry t — the standard sort-based-splatting approximation; the
    oracle keeps exact per-ray order, and the PSNR gap between the two is
    part of the test suite.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.ops.composite import composite_depth_ordered
from gaussian_ray_tracing_tpu.ops.response import (
    adaptive_radius,
    canonical_frames,
    ray_ellipsoid_span,
)
from gaussian_ray_tracing_tpu.ops.sh import eval_sh, num_coeffs
from gaussian_ray_tracing_tpu.ops.tiles import TileBinning, bin_tiles, project_footprints
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene


def tile_rays(dirs: jnp.ndarray, tile_w: int, tile_h: int) -> jnp.ndarray:
    """(H', W', C) -> (T, tile_h*tile_w, C), padding H/W up to tile multiples."""
    H, W = dirs.shape[:2]
    Hp, Wp = -(-H // tile_h) * tile_h, -(-W // tile_w) * tile_w
    if (Hp, Wp) != (H, W):
        dirs = jnp.pad(dirs, [(0, Hp - H), (0, Wp - W)] + [(0, 0)] * (dirs.ndim - 2))
    ty, tx = Hp // tile_h, Wp // tile_w
    x = dirs.reshape(ty, tile_h, tx, tile_w, -1)
    x = jnp.transpose(x, (0, 2, 1, 3, 4))
    return x.reshape(ty * tx, tile_h * tile_w, -1)


def untile_image(tiles: jnp.ndarray, height: int, width: int, tile_w: int, tile_h: int):
    """(T, tile_h*tile_w, C) -> (H, W, C), cropping tile padding."""
    ty, tx = -(-height // tile_h), -(-width // tile_w)
    c = tiles.shape[-1]
    x = tiles.reshape(ty, tx, tile_h, tile_w, c)
    x = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(ty * tile_h, tx * tile_w, c)
    return x[:height, :width]


def march_tile_chunk(
    cand: jnp.ndarray,  # (Tc, M_cap)
    dirs: jnp.ndarray,  # (Tc, R, 3)
    eye: jnp.ndarray,  # (3,)
    feats: dict,  # per-gaussian arrays, see render_tiled
    config: RenderConfig,
):
    """March a chunk of tiles through their candidate lists."""
    Tc, m_cap = cand.shape
    R = dirs.shape[1]
    mc = min(config.march_chunk, m_cap)
    n_steps = -(-m_cap // mc)
    dtype = jnp.dtype(config.compute_dtype)
    dirs_c = dirs.astype(dtype)

    sh_deg = config.sh_degree
    if sh_deg > 0:
        # view-dir SH colors need normalized dirs; dirs are already unit
        pass

    def step(carry, idx_chunk):
        t_carry, rgb_acc = carry
        ids = idx_chunk  # (Tc, mc)
        safe = jnp.maximum(ids, 0)
        present = ids >= 0

        mu = feats["means"][safe].astype(dtype)  # (Tc, mc, 3)
        Mg = feats["M"][safe].astype(dtype)  # (Tc, mc, 3, 3)
        op = feats["opacities"][safe].astype(dtype)  # (Tc, mc)
        rad = feats["radius"][safe].astype(dtype)  # (Tc, mc)

        # o_g shared across rays in a tile (primary rays share the eye)
        o_g = jnp.einsum("tmij,tmj->tmi", Mg, eye.astype(dtype) - mu)  # (Tc, mc, 3)
        d_g = jnp.einsum("tmij,trj->trmi", Mg, dirs_c)  # (Tc, R, mc, 3)
        dd = jnp.sum(d_g * d_g, axis=-1)  # (Tc, R, mc)
        od = jnp.einsum("tmi,trmi->trm", o_g, d_g)
        oo = jnp.sum(o_g * o_g, axis=-1)[:, None, :]  # (Tc, 1, mc)

        t_star = -od / jnp.maximum(dd, 1e-6)
        pp = oo + 2.0 * t_star * od + t_star * t_star * dd  # |o_g + t* d_g|^2
        resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
        alpha = jnp.minimum(config.alpha_clamp, resp * op[:, None, :])

        # iso-ellipsoid event time within [t_min, t_max] (oracle hit rule)
        cq = oo - (rad * rad)[:, None, :]
        disc = od * od - dd * cq
        hit = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_dd = 1.0 / jnp.maximum(dd, 1e-12)
        t_entry = (-od - sq) * inv_dd
        t_exit = (-od + sq) * inv_dd
        t_event = jnp.where(t_entry < config.t_min, t_exit, t_entry)
        in_window = (t_event >= config.t_min) & (t_event <= config.t_max)
        live = jnp.sum(dirs_c * dirs_c, axis=-1) > 0.01  # (Tc, R)
        valid = present[:, None, :] & hit & in_window & live[..., None]

        if sh_deg == 0:
            color_g = eval_sh(feats["sh"][safe].astype(dtype), dirs_c[:, :1], 0)
            # (Tc, 1, 3) broadcast against mc? eval_sh consumed dirs (Tc,1,3) and
            # sh (Tc,mc,K,3) -> (Tc, mc, 3); expand ray axis:
            colors = jnp.broadcast_to(color_g[:, None], (Tc, R, ids.shape[1], 3))
        else:
            sh_g = feats["sh"][safe].astype(dtype)  # (Tc, mc, K, 3)
            colors = eval_sh(sh_g[:, None], dirs_c[:, :, None, :], sh_deg)

        if config.order == "window":
            # per-ray re-sort of this chunk by exact event t: bounded-window
            # exact ordering (inversions wider than march_chunk remain)
            sort_key = jnp.where(valid, t_event, jnp.inf)
            ord_idx = jnp.argsort(sort_key, axis=-1)
            alpha = jnp.take_along_axis(alpha, ord_idx, axis=-1)
            valid = jnp.take_along_axis(valid, ord_idx, axis=-1)
            colors = jnp.take_along_axis(
                jnp.broadcast_to(colors, alpha.shape + (3,)), ord_idx[..., None], axis=-2
            )

        rgb_seg, _, t_next = composite_depth_ordered(
            alpha,
            colors,
            valid,
            alpha_min=config.alpha_min,
            min_transmittance=config.min_transmittance,
            hit_multiplicity=config.hit_multiplicity,
            t0=t_carry,
        )
        return (t_next, rgb_acc + rgb_seg), None

    pad = n_steps * mc - m_cap
    cand_p = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1) if pad else cand
    chunks = jnp.transpose(cand_p.reshape(Tc, n_steps, mc), (1, 0, 2))
    init = (
        jnp.ones((Tc, R), dtype),
        jnp.zeros((Tc, R, 3), dtype),
    )
    (t_final, rgb), _ = jax.lax.scan(step, init, chunks)
    return rgb, 1.0 - t_final


def prepare_frame(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
):
    """Frame setup shared by the local and sharded renderers: per-gaussian
    features, tile binning, and per-tile ray directions."""
    M = canonical_frames(scene.scales, scene.quats)
    radius = adaptive_radius(scene.opacities, config.alpha_min)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = project_footprints(scene.means, bound_radius, camera, config)
    # global depth key matching the oracle's per-ray event rule evaluated on
    # the central ray through each gaussian (entry t, or exit t when the
    # camera sits inside the iso ellipsoid) — far better ordering than view
    # depth for near/enclosing gaussians
    rel = scene.means - camera.eye
    rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
    hit, t_in, t_out = ray_ellipsoid_span(
        scene.means, M, radius, camera.eye, rel / rho[:, None]
    )
    key = jnp.where(t_in >= config.t_min, t_in, t_out)
    key = jnp.where(hit, key, rho)  # radius-0 (invisible) entries: any key
    fp = fp._replace(depth=key)
    binning: TileBinning = bin_tiles(fp, camera, config, pair_capacity)

    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)  # (T, R, 3)

    k = num_coeffs(config.sh_degree)
    feats = {
        "means": scene.means,
        "M": M,
        "opacities": scene.opacities,
        "radius": radius,
        "sh": scene.sh[:, :k],
    }
    cand = merge_big_into_tiles(binning.cand, binning.big, fp.depth)
    binning = binning._replace(cand=cand)
    return feats, binning, dirs_t, valid


def merge_big_into_tiles(cand: jnp.ndarray, big: jnp.ndarray, depth: jnp.ndarray):
    """Depth-merge the broadcast ("big footprint") list into every tile's
    already depth-sorted candidate list. -1 entries sort to the end."""
    T, M = cand.shape
    B = big.shape[0]
    if B == 0:
        return cand
    comb = jnp.concatenate([cand, jnp.broadcast_to(big[None], (T, B))], axis=1)
    d = jnp.where(comb >= 0, depth[jnp.maximum(comb, 0)], jnp.inf)
    order = jnp.argsort(d, axis=1)
    return jnp.take_along_axis(comb, order, axis=1)


def march_frame(cand, dirs_t, eye, feats, config: RenderConfig, tile_chunk: int):
    """March every tile (chunked): (T, M_cap) + (T, R, 3) -> rgb/alpha tiles."""
    T = dirs_t.shape[0]
    n_chunks = -(-T // tile_chunk)
    pad_t = n_chunks * tile_chunk - T
    cand_p = jnp.pad(cand, ((0, pad_t), (0, 0)), constant_values=-1) if pad_t else cand
    dirs_p = jnp.pad(dirs_t, ((0, pad_t), (0, 0), (0, 0))) if pad_t else dirs_t

    def chunk_fn(args):
        cand_c, dirs_c = args
        return march_tile_chunk(cand_c, dirs_c, eye, feats, config)

    rgb_t, alpha_t = jax.lax.map(
        chunk_fn,
        (
            cand_p.reshape(n_chunks, tile_chunk, -1),
            dirs_p.reshape(n_chunks, tile_chunk, dirs_t.shape[1], 3),
        ),
    )
    rgb_t = rgb_t.reshape(n_chunks * tile_chunk, -1, 3)[:T]
    alpha_t = alpha_t.reshape(n_chunks * tile_chunk, -1)[:T]
    return rgb_t, alpha_t


def default_pair_capacity(n: int) -> int:
    return max(8 * n, 1 << 16)


@partial(jax.jit, static_argnames=("config", "tile_chunk", "pair_capacity", "return_aux"))
def render_tiled(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    tile_chunk: int = 16,
    pair_capacity: int | None = None,
    return_aux: bool = False,
):
    """Full-frame tiled render. Returns {rgb (H,W,3), alpha (H,W), aux}."""
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)

    feats, binning, dirs_t, valid = prepare_frame(scene, camera, config, pair_capacity)
    H, W = camera.height, camera.width
    rgb_t, alpha_t = march_frame(
        binning.cand, dirs_t, camera.eye, feats, config, tile_chunk
    )

    rgb = untile_image(rgb_t.astype(jnp.float32), H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        alpha_t.astype(jnp.float32)[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    out = {"rgb": rgb, "alpha": alpha}
    if return_aux:
        out["aux"] = {"n_pairs": binning.n_pairs, "n_dropped": binning.n_dropped}
    return out
