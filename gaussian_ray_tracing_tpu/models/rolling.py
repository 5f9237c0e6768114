"""Rolling-shutter rendering (per-scanline camera pose).

A 3DGRUT-style capability beyond the reference (single global shutter,
shaders/tracer.cu:17-110). Scanline y is exposed at readout time
t = y/(H-1) with the pose lerped cam0 -> cam1 (cameras.generate_rays_rolling).

Two paths:
  - oracle: exact per-ray brute force with the true per-row origins —
    row y of the output is BIT-IDENTICAL to row y of a global-shutter
    oracle render at the row's pose (the property the tests pin).
  - pallas: the fused march kernel in per-ray-origin mode (the same mode
    bounced segments use). Binning is conservative under motion: the
    footprint rect is the UNION of the exact conic bboxes at cam0, mid,
    and cam1; depth keys come from the midpoint pose.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import (
    Camera,
    generate_rays_rolling,
    lerp_camera,
)
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.tiled import (
    default_pair_capacity,
    feature_table,
    tile_rays,
    untile_image,
)
from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
from gaussian_ray_tracing_tpu.ops.tiles import (
    Footprint,
    bin_pairs,
    num_tiles,
    project_footprints_conic,
)
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene


def _union_footprints(scene, radius, bound_radius, cams, config) -> Footprint:
    """Union rect of the exact footprints across poses (conservative for
    any intermediate pose of a lerped segment up to the sampled margin;
    the per-pose +1 px slack absorbs the lerp's slight nonlinearity in
    projection for small motions)."""
    fps = [
        project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound_radius,
            cam, config,
        )
        for cam in cams
    ]
    x0 = jnp.min(jnp.stack([fp.px - fp.rx for fp in fps]), axis=0)
    x1 = jnp.max(jnp.stack([fp.px + fp.rx for fp in fps]), axis=0)
    y0 = jnp.min(jnp.stack([fp.py - fp.ry for fp in fps]), axis=0)
    y1 = jnp.max(jnp.stack([fp.py + fp.ry for fp in fps]), axis=0)
    visible = jnp.stack([fp.visible for fp in fps]).any(axis=0)
    return Footprint(
        px=0.5 * (x0 + x1),
        py=0.5 * (y0 + y1),
        rx=0.5 * (x1 - x0),
        ry=0.5 * (y1 - y0),
        depth=fps[len(fps) // 2].depth,
        visible=visible,
    )


@partial(
    jax.jit,
    static_argnames=("config", "pair_capacity", "chunk", "interpret"),
)
def render_rolling_pallas(
    scene: GaussianScene,
    cam0: Camera,
    cam1: Camera,
    config: RenderConfig = RenderConfig(),
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Rolling-shutter frame on the fused Pallas kernel (per-ray origins)."""
    from gaussian_ray_tracing_tpu.models.pallas_renderer import (
        _interpret_default,
    )
    from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream

    if interpret is None:
        interpret = _interpret_default()
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))

    cam_mid = lerp_camera(cam0, cam1, 0.5)
    table, M, radius = feature_table(scene, config)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = _union_footprints(
        scene, radius, bound_radius, (cam0, cam_mid, cam1), config
    )
    # midpoint-pose depth key (models/tiled.prepare_frame rule)
    rel = scene.means - cam_mid.eye
    rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
    hit, t_in, t_out = ray_ellipsoid_span(
        scene.means, M, radius, cam_mid.eye, rel / rho[:, None]
    )
    key = jnp.where(t_in >= config.t_min, t_in, t_out)
    key = jnp.where(hit, key, rho)
    fp = fp._replace(depth=key)

    stream = bin_pairs(fp, cam_mid, config, pair_capacity)
    table_for_pairs = table[stream.order] if stream.order is not None else table
    F = table.shape[1]
    if F < 128:
        table_for_pairs = jnp.pad(table_for_pairs, ((0, 0), (0, 128 - F)))
    gid_ext = jnp.concatenate(
        [stream.gid, jnp.zeros((chunk,), stream.gid.dtype)]
    )
    pair_feats = table_for_pairs[jnp.maximum(gid_ext, 0)]

    origins, dirs, valid = generate_rays_rolling(cam0, cam1, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
    origins_t = tile_rays(origins, config.tile_w, config.tile_h)
    tx_n, ty_n = num_tiles(cam_mid, config)

    rgb_t, t_final_t = pallas_march_stream(
        stream.starts,
        cam_mid.eye.astype(jnp.float32),
        pair_feats,
        dirs_t,
        config,
        n_tiles=tx_n * ty_n,
        rays_per_tile=config.rays_per_tile,
        chunk=chunk,
        interpret=interpret,
        origins_t=origins_t,
    )
    H, W = cam0.height, cam0.width
    rgb = untile_image(rgb_t, H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_final_t)[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}


@partial(jax.jit, static_argnames=("config", "ray_chunk"))
def render_rolling_oracle(
    scene: GaussianScene,
    cam0: Camera,
    cam1: Camera,
    config: RenderConfig = RenderConfig(),
    ray_chunk: int = 4096,
):
    """Exact rolling-shutter render (per-ray brute force)."""
    from gaussian_ray_tracing_tpu.models.oracle import render_rays_oracle

    origins, dirs, valid = generate_rays_rolling(cam0, cam1, config)
    H, W = cam0.height, cam0.width
    rgb, alpha, _ = render_rays_oracle(
        scene, origins.reshape(-1, 3), dirs.reshape(-1, 3), config,
        ray_chunk=ray_chunk,
    )
    rgb = jnp.clip(rgb.reshape(H, W, 3), 0.0, 1.0)
    alpha = alpha.reshape(H, W)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}
