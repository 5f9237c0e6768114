"""Full-frame renderer on the fused Pallas pair-stream march kernel.

The fast single-chip forward path (BASELINE.json config "pinhole" headline):
conservative footprints -> packed-key pair sort (ops/tiles.bin_pairs) ->
ONE packed feature row gather -> the fused Pallas march
(ops/pallas_march.py). Semantics match the XLA tiled path with
order="key" (global per-tile depth order, the standard sorted-splatting
approximation); the oracle and the tiled "window" mode remain the
exact-ordering references. For gradients/training use render_pallas_diff
(hand-written backward kernel) or the XLA tiled path.

On non-TPU backends the kernel runs in the Pallas interpreter (slow,
test-only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.tiled import (
    default_pair_capacity,
    feature_table,
    tile_rays,
    untile_image,
)
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
from gaussian_ray_tracing_tpu.ops.tiles import (
    bin_pairs,
    num_tiles,
    project_footprints_conic,
)
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def prepare_pair_stream(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
    chunk: int,
    packed16: bool = False,
):
    """Primary-view frame prep shared by the plain and mesh-bounce renderers:
    feature table -> tight footprints -> sorted pair stream -> ONE padded
    per-pair feature gather (128 columns for lane-aligned kernel DMAs).

    The table carries the quadratic-form columns for the kernel's MXU
    response path (shared primary-ray origin; see feature_table)."""
    table, M, radius = feature_table(scene, config, eye=camera.eye)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = project_footprints_conic(
        scene.means, scene.scales, scene.quats, radius, bound_radius,
        camera, config,
    )
    # central-ray event depth key (same rule as models/tiled.prepare_frame)
    rel = scene.means - camera.eye
    rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
    hit, t_in, t_out = ray_ellipsoid_span(
        scene.means, M, radius, camera.eye, rel / rho[:, None]
    )
    key = jnp.where(t_in >= config.t_min, t_in, t_out)
    key = jnp.where(hit, key, rho)
    fp = fp._replace(depth=key)

    geom = (scene.means, M.reshape(-1, 9), radius)
    stream = bin_pairs(fp, camera, config, pair_capacity, geom=geom)
    if stream.order is not None:
        # rank-space gids: gather pair features from the depth-reordered
        # table (N-row gather; the returned `table` stays in original id
        # order for the morton-block bounce path)
        table_for_pairs = table[stream.order]
    else:
        table_for_pairs = table

    # pad feature columns to 128: Mosaic tiles HBM arrays at 128 lanes and
    # requires DMA slices aligned to that tiling (a narrower minor dim was
    # tried and rejected by the compiler), and row gathers cost the same
    # at any width up to 128
    F = table.shape[1]
    if F < 128:
        table = jnp.pad(table, ((0, 0), (0, 128 - F)))
        if not packed16:
            table_for_pairs = jnp.pad(table_for_pairs, ((0, 0), (0, 128 - F)))
    if packed16:
        # int16 bit-split quad table: the bandwidth-bound P-row gather
        # moves half the bytes (PERF.md round 3; exact f32 reassembly
        # happens in-kernel)
        from gaussian_ray_tracing_tpu.models.tiled import feature_table_packed16

        t16 = feature_table_packed16(table, config)
        table_for_pairs = (
            t16[stream.order] if stream.order is not None else t16
        )
    # extend gid by `chunk` (+16 for packed16's aligned overfetch) slots
    # BEFORE the gather (the last DMA of the last tile may read past
    # starts[-1]); padding the gathered array instead would copy the whole
    # stream a second time
    gid_ext = jnp.concatenate(
        [stream.gid, jnp.zeros((chunk + 16,), stream.gid.dtype)]
    )
    pair_feats = table_for_pairs[jnp.maximum(gid_ext, 0)]
    return stream, pair_feats, table, bound_radius


@partial(
    jax.jit,
    static_argnames=("config", "pair_capacity", "chunk", "interpret", "return_aux", "quad"),
)
def render_pallas(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
    return_aux: bool = False,
    quad: bool = True,
):
    """Full-frame primary-ray render via the Pallas march kernel.

    Returns {rgb (H,W,3) float in [0,1], alpha (H,W)}.
    """
    if interpret is None:
        interpret = _interpret_default()
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    if chunk is None:
        # kernel march/sort window; 256 = parity-grade ordering window
        chunk = max(32, min(config.march_chunk, 256))

    packed16 = bool(config.packed16) and quad
    stream, pair_feats, _, _ = prepare_pair_stream(
        scene, camera, config, pair_capacity, chunk, packed16=packed16
    )

    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)  # (T, R, 3)
    tx_n, ty_n = num_tiles(camera, config)

    rgb_t, t_final_t = pallas_march_stream(
        stream.starts,
        camera.eye.astype(jnp.float32),
        pair_feats,
        dirs_t,
        config,
        n_tiles=tx_n * ty_n,
        rays_per_tile=config.rays_per_tile,
        chunk=chunk,
        interpret=interpret,
        quad=quad,
        packed16=packed16,
    )

    H, W = camera.height, camera.width
    alpha_t = 1.0 - t_final_t
    rgb = untile_image(rgb_t, H, W, config.tile_w, config.tile_h)
    alpha = untile_image(alpha_t[..., None], H, W, config.tile_w, config.tile_h)[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    out = {"rgb": rgb, "alpha": alpha}
    if return_aux:
        out["aux"] = {"n_pairs": stream.n_pairs, "n_dropped": stream.n_dropped}
    return out


@partial(
    jax.jit,
    static_argnames=("config", "pair_capacity", "chunk", "interpret"),
)
def render_pallas_diff(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Differentiable full-frame render on the fused Pallas kernels.

    Forward = the march kernel; backward = the hand-written reverse-sweep
    kernel (ops/pallas_march.py): per-pair feature gradients flow through
    the packed feature gather's transpose (a scatter-add over pairs) into
    the feature table and from there into scene parameters — gradients
    w.r.t. means, covariance (via the S^-1 R^T rows), opacity, and SH, as
    the BASELINE north star specifies. Binning structure (which pairs
    exist, their order) is non-differentiable, exactly like the tiled XLA
    path and 3DGS rasterizers.

    Supports order="key" AND order="window": the backward kernel re-runs
    the forward's per-ray bitonic sort (carrying the source index) and
    inverts the permutation with a second sort, so parity-grade window
    ordering trains with hand-written gradients too. Other orders fall
    back to "key".
    """
    from gaussian_ray_tracing_tpu.ops.pallas_march import march_stream_diff

    if config.order not in ("key", "window"):
        config = config.replace(order="key")
    if interpret is None:
        interpret = _interpret_default()
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))

    stream, pair_feats, _, _ = prepare_pair_stream(
        scene, camera, config, pair_capacity, chunk
    )
    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
    tx_n, ty_n = num_tiles(camera, config)

    rgb_t, t_final_t = march_stream_diff(
        stream.starts,
        camera.eye.astype(jnp.float32),
        pair_feats,
        dirs_t,
        config,
        tx_n * ty_n,
        config.rays_per_tile,
        chunk,
        interpret,
        # key-order training uses the f32 VPU quad response (the backward
        # recomputes the algebraically identical scalar form); window
        # training stays scalar so the backward's sort replay is bit-exact
        config.order == "key",
    )
    H, W = camera.height, camera.width
    alpha_t = 1.0 - t_final_t
    rgb = untile_image(rgb_t, H, W, config.tile_w, config.tile_h)
    alpha = untile_image(alpha_t[..., None], H, W, config.tile_w, config.tile_h)[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}
