"""Sharded renderers over a jax.sharding.Mesh.

Three strategies (BASELINE.json config 5; none exist in the single-GPU
reference, SURVEY.md section 2 parallelism census):

  1. render_rays_sharded_oracle — flat rays sharded over the 'rays' axis,
     gaussians replicated; embarrassingly parallel, exact.
  2. render_tiled_sharded — image tiles sharded over 'rays', gaussians
     replicated; the production ray-DP forward (binning is replicated,
     the march is shard_map'ed and differentiable).
  3. render_gaussian_sharded — gaussians depth-slab partitioned over the
     'gauss' axis (optionally rays over 'rays' too): each shard composites
     its own contiguous view-depth slab with carry-in transmittance 1, then
     an all_gather + ordered segment fold combines slabs front-to-back —
     the compositing recurrence is associative over depth-ordered segments
     (the ring-attention analog for volume rendering).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.oracle import render_rays_oracle
from gaussian_ray_tracing_tpu.models.tiled import (
    default_pair_capacity,
    march_frame,
    prepare_frame,
    tile_rays,
    untile_image,
)
from gaussian_ray_tracing_tpu.parallel.mesh import GAUSS_AXIS, RAY_AXIS
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene

shard_map = jax.shard_map


def _pad_leading(x, mult, **pad_kw):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x, n
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, **pad_kw), n


@partial(jax.jit, static_argnames=("config", "mesh", "ray_chunk"))
def render_rays_sharded_oracle(
    scene: GaussianScene,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    config: RenderConfig,
    mesh: Mesh,
    ray_chunk: int = 1024,
):
    """Exact oracle render with rays sharded over mesh axis 'rays'."""
    n_dev = mesh.shape[RAY_AXIS]
    R = origins.shape[0]
    origins_p, _ = _pad_leading(origins, n_dev * ray_chunk)
    dirs_p, _ = _pad_leading(dirs, n_dev * ray_chunk)

    def local(scene_l, o_l, d_l):
        return render_rays_oracle(scene_l, o_l, d_l, config, ray_chunk=ray_chunk)

    rgb, density, t_final = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(RAY_AXIS), P(RAY_AXIS)),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )(scene, origins_p, dirs_p)
    return rgb[:R], density[:R], t_final[:R]


@partial(jax.jit, static_argnames=("config", "mesh", "tile_chunk", "pair_capacity"))
def render_tiled_sharded(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    tile_chunk: int = 16,
    pair_capacity: int | None = None,
):
    """Tiled fast-path render, image tiles sharded over 'rays'.

    Binning is computed replicated (cheap relative to the march); the march
    runs one tile shard per device. Differentiable end to end: gradients of
    the replicated gaussian features are psum'd across the ray shards by
    shard_map's transpose.
    """
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    n_dev = mesh.shape[RAY_AXIS]

    feats, binning, dirs_t, valid = prepare_frame(scene, camera, config, pair_capacity)
    T = dirs_t.shape[0]
    cand_p, _ = _pad_leading(binning.cand, n_dev, constant_values=-1)
    dirs_p, _ = _pad_leading(dirs_t, n_dev)

    def local(cand_l, dirs_l, eye_l, feats_l):
        return march_frame(cand_l, dirs_l, eye_l, feats_l, config, tile_chunk)

    rgb_t, alpha_t = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )(cand_p, dirs_p, camera.eye, feats)
    rgb_t, alpha_t = rgb_t[:T], alpha_t[:T]

    H, W = camera.height, camera.width
    rgb = untile_image(rgb_t.astype(jnp.float32), H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        alpha_t.astype(jnp.float32)[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}


def combine_slab_segments(rgb_slabs: jnp.ndarray, t_slabs: jnp.ndarray):
    """Ordered front-to-back fold of per-slab (radiance, transmittance).

    rgb_slabs: (S, ..., 3) per-slab radiance composited with carry-in T = 1.
    t_slabs:   (S, ...) per-slab final transmittance.
    The recurrence C += (prod of earlier T) * C_i is exact because radiance
    is linear in the carry-in transmittance.
    """
    t_excl = jnp.concatenate([jnp.ones_like(t_slabs[:1]), jnp.cumprod(t_slabs, 0)[:-1]], 0)
    rgb = jnp.sum(t_excl[..., None] * rgb_slabs, axis=0)
    t_total = jnp.prod(t_slabs, axis=0)
    return rgb, t_total


@partial(jax.jit, static_argnames=("config", "mesh", "ray_chunk"))
def render_gaussian_sharded(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    ray_chunk: int = 1024,
):
    """Full-frame render with gaussians depth-slab sharded over 'gauss'.

    Scales scenes beyond one chip's HBM: each device holds only its slab.
    Rays are also sharded over 'rays' when that axis exists in the mesh.
    Within-slab ordering is each ray's exact entry-depth order (oracle
    semantics); cross-slab ordering is by view depth. Early termination is
    applied per-slab and in the fold (contributions after global
    T < min_transmittance are bounded by min_transmittance).
    """
    n_slab = mesh.shape[GAUSS_AXIS]
    have_ray_axis = RAY_AXIS in mesh.shape
    ray_spec = P(RAY_AXIS) if have_ray_axis else P()
    n_ray = mesh.shape.get(RAY_AXIS, 1)

    # depth-sort gaussians into contiguous slabs (padding sorts last: it has
    # opacity 0 and is invisible regardless of slab)
    U, V, W = camera.uvw_frame()
    w_hat = W / jnp.maximum(jnp.linalg.norm(W), 1e-12)
    depth = (scene.means - camera.eye) @ w_hat
    order = jnp.argsort(depth)
    sorted_scene = GaussianScene(
        means=scene.means[order],
        scales=scene.scales[order],
        quats=scene.quats[order],
        opacities=scene.opacities[order],
        sh=scene.sh[order],
        num_active=scene.num_gaussians,
    )

    origins, dirs, valid = generate_rays(camera, config)
    H, W_px = dirs.shape[:2]
    o_flat = origins.reshape(-1, 3)
    d_flat = dirs.reshape(-1, 3)
    R = o_flat.shape[0]
    o_p, _ = _pad_leading(o_flat, n_ray * ray_chunk)
    d_p, _ = _pad_leading(d_flat, n_ray * ray_chunk)

    def local(scene_l, o_l, d_l):
        rgb_l, _, t_l = render_rays_oracle(scene_l, o_l, d_l, config, ray_chunk=ray_chunk)
        # gather all slabs of my ray shard, fold in slab order
        rgb_all = jax.lax.all_gather(rgb_l, GAUSS_AXIS)  # (S, R_l, 3)
        t_all = jax.lax.all_gather(t_l, GAUSS_AXIS)  # (S, R_l)
        rgb, t_total = combine_slab_segments(rgb_all, t_all)
        return rgb, 1.0 - t_total

    scene_spec = GaussianScene(
        means=P(GAUSS_AXIS), scales=P(GAUSS_AXIS), quats=P(GAUSS_AXIS),
        opacities=P(GAUSS_AXIS), sh=P(GAUSS_AXIS), num_active=scene.num_gaussians,
    )
    rgb, density = shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, ray_spec, ray_spec),
        out_specs=(ray_spec, ray_spec),
        check_vma=False,
    )(sorted_scene, o_p, d_p)
    rgb = jnp.clip(rgb[:R].reshape(H, W_px, 3), 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    density = jnp.where(valid, density[:R].reshape(H, W_px), 0.0)
    return {"rgb": rgb, "alpha": density}


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "pair_capacity", "chunk", "interpret"),
)
def render_pallas_sharded(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Fused-Pallas forward with image tiles sharded over 'rays'.

    SHARDED BINNING: each device bins only its own band of tile ROWS
    (ops/tiles.bin_pairs tile_rows=...), so the pair expansion, the P-sized
    tile sort, AND the per-pair feature gather all scale 1/n_dev — only the
    O(N) per-gaussian work (feature table, footprints, depth pre-sort) is
    replicated. The result is bit-identical to single-device render_pallas:
    a band's pair stream is exactly the full stream's rows restricted to
    its tiles, in the same stable depth order. pair_capacity is the TOTAL
    frame budget; each shard gets ceil(cap / n_dev) (+n_dropped output for
    capacity monitoring — bands are not perfectly balanced). This is ray
    data parallelism for the production forward path — the embarrassingly
    parallel axis the single-GPU reference cannot use (SURVEY.md census).
    """
    from gaussian_ray_tracing_tpu.models.pallas_renderer import (
        _interpret_default,
    )
    from gaussian_ray_tracing_tpu.models.tiled import (
        default_pair_capacity,
        feature_table,
        tile_rays,
        untile_image,
    )
    from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
    from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
    from gaussian_ray_tracing_tpu.ops.tiles import (
        bin_pairs,
        num_tiles,
        project_footprints_conic,
    )

    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    n_dev = mesh.shape[RAY_AXIS]
    R = config.rays_per_tile

    # --- replicated O(N) frame prep (same math as prepare_pair_stream) ---
    table, M, radius = feature_table(scene, config, eye=camera.eye)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = project_footprints_conic(
        scene.means, scene.scales, scene.quats, radius, bound_radius,
        camera, config,
    )
    rel = scene.means - camera.eye
    rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
    hit, t_in, t_out = ray_ellipsoid_span(
        scene.means, M, radius, camera.eye, rel / rho[:, None]
    )
    key = jnp.where(t_in >= config.t_min, t_in, t_out)
    key = jnp.where(hit, key, rho)
    fp = fp._replace(depth=key)

    # depth pre-sort is shard-independent: reorder the table ONCE here so
    # shards gather from the same rank-space table bin_pairs indexes into
    dkey = jax.lax.bitcast_convert_type(
        jnp.clip(fp.depth, 1e-30, 1e30), jnp.int32
    )
    _, order = jax.lax.sort_key_val(
        dkey, jnp.arange(scene.means.shape[0], dtype=jnp.int32)
    )
    table_sorted = table[order]
    F = table.shape[1]
    if F < 128:
        table_sorted = jnp.pad(table_sorted, ((0, 0), (0, 128 - F)))

    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
    tx_n, ty_n = num_tiles(camera, config)
    T = tx_n * ty_n
    rows_local = -(-ty_n // n_dev)
    T_local = rows_local * tx_n
    pad_t = n_dev * T_local - T
    if pad_t:
        dirs_t = jnp.pad(dirs_t, ((0, pad_t), (0, 0), (0, 0)))
    cap_local = -(-pair_capacity // n_dev)

    def local(fp_l, table_l, dirs_l, eye_l):
        d = jax.lax.axis_index(RAY_AXIS)
        stream = bin_pairs(
            fp_l, camera, config, cap_local,
            tile_rows=(d * rows_local, rows_local),
        )
        gid_ext = jnp.concatenate(
            [stream.gid, jnp.zeros((chunk,), stream.gid.dtype)]
        )
        feats_l = table_l[jnp.maximum(gid_ext, 0)]
        rgb_l, t_l = pallas_march_stream(
            stream.starts, eye_l, feats_l, dirs_l, config,
            n_tiles=T_local, rays_per_tile=R, chunk=chunk, interpret=interpret,
            quad=True,
        )
        dropped = jax.lax.psum(stream.n_dropped, RAY_AXIS)
        return rgb_l, t_l, dropped

    rgb_t, t_final, n_dropped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P()),
        check_vma=False,
    )(fp, table_sorted, dirs_t, camera.eye.astype(jnp.float32))

    H, W = camera.height, camera.width
    rgb = untile_image(rgb_t[:T], H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_final[:T])[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha, "n_dropped": n_dropped}


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "pair_capacity", "tile_chunk",
                     "straddle", "overlap_capacity"),
)
def render_gaussian_sharded_fast(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    pair_capacity: int | None = None,
    tile_chunk: int = 16,
    straddle: str = "slab",
    overlap_capacity: int | None = None,
):
    """Depth-slab gaussian partitioning on the FAST tiled march.

    For scenes beyond one chip's HBM (BASELINE config 5: 1M+ gaussians):
    gaussians are view-depth sorted and split into contiguous slabs, one
    per device on the 'gauss' axis. Each shard runs the full tiled
    pipeline (binning + march) over ITS slab only — every per-gaussian
    and per-pair buffer is 1/n_dev sized — then an all_gather + ordered
    front-to-back segment fold combines the slabs (the compositing
    recurrence is associative over depth-ordered segments; the
    ring-attention analog for volume rendering, see combine_slab_segments).

    straddle="slab" (fast): gaussians STRADDLING a slab cut are composited
    in slab order — on dense high-overlap scenes the decomposition itself
    costs quality vs a single device.

    straddle="exact": every gaussian within its own bound radius of a cut
    is replicated to the neighboring slab (overlap windows of
    `overlap_capacity` extra slots each side, default slab/2), and each
    HIT EVENT is composited by exactly one slab — the one whose view-depth
    interval [c_k, c_{k+1}) contains the event's per-ray view depth
    z = t_event * (w_hat . d) (march gate, models/tiled.march_tile_chunk).
    Slab index is then monotone in t_event along every ray, so the
    cross-slab fold is EXACTLY per-ray depth ordered: matches the
    single-device window-order render up to float associativity, with no
    straddler quality loss. Returns n_straddle_dropped (overlap-capacity
    overflow; 0 means the decomposition is exact).
    """
    from gaussian_ray_tracing_tpu.models.tiled import (
        default_pair_capacity,
        march_frame,
        prepare_frame,
        tile_rays,
        untile_image,
    )
    from gaussian_ray_tracing_tpu.ops.response import adaptive_radius

    n_slab = mesh.shape[GAUSS_AXIS]
    N = scene.num_gaussians

    # contiguous view-depth slabs (padding has opacity 0: invisible anywhere)
    U, V, W = camera.uvw_frame()
    w_hat = W / jnp.maximum(jnp.linalg.norm(W), 1e-12)
    depth = (scene.means - camera.eye) @ w_hat
    order = jnp.argsort(depth)
    pad = (-N) % n_slab
    n_pad = N + pad
    if pad:
        order = jnp.concatenate([order, order[-1:].repeat(pad)])
    slab = n_pad // n_slab

    if straddle == "exact":
        if overlap_capacity is None:
            overlap_capacity = max(64, slab // 2)
        M_cap = slab + 2 * overlap_capacity
        if pair_capacity is None:
            pair_capacity = default_pair_capacity(M_cap)
        depth_sorted = depth[order]
        active_rank = jnp.arange(n_pad) < N
        op_sorted = jnp.where(active_rank, scene.opacities[order], 0.0)
        bound_r = adaptive_radius(op_sorted, config.alpha_min) * jnp.max(
            scene.scales[order], axis=-1
        )
        bound_r = jnp.where(active_rank, bound_r, 0.0)
        # slab cut planes in view depth; slab k owns z in [lo[k], hi[k])
        cuts = depth_sorted[jnp.arange(1, n_slab) * slab]
        inf = jnp.array([jnp.inf], depth_sorted.dtype)
        lo_bound = jnp.concatenate([-inf, cuts])  # (n_slab,)
        hi_bound = jnp.concatenate([cuts, inf])
        # member rule (per-gaussian reach: every event's view depth lies
        # within bound_r of the center's):
        #   depth_i + r_i >= c_k  AND  depth_i - r_i < c_{k+1}
        # contiguous covers of these non-contiguous sets via the monotone
        # prefix-max of (depth + r) and suffix-min of (depth - r); a single
        # global r_max would let one giant background gaussian drag every
        # slab's window over the whole scene
        reach_hi = jax.lax.cummax(depth_sorted + bound_r)  # prefix max
        reach_lo = -jax.lax.cummax((bound_r - depth_sorted)[::-1])[::-1]
        lo_idx = jnp.searchsorted(reach_hi, lo_bound, side="left")
        hi_idx = jnp.searchsorted(reach_lo, hi_bound, side="left")
        ks = jnp.arange(n_slab)
        # capacity clamp keeps the OWNED slab [k*slab, (k+1)*slab) intact
        start = jnp.clip(
            lo_idx,
            jnp.maximum((ks + 1) * slab - M_cap, 0),
            ks * slab,
        )
        n_dropped = jnp.sum(
            jnp.maximum(start - lo_idx, 0)
            + jnp.maximum(hi_idx - (start + M_cap), 0)
        )
        idx = start[:, None] + jnp.arange(M_cap)[None, :]  # (n_slab, M_cap)
        idx_c = jnp.clip(idx, 0, n_pad - 1)
        d_g = depth_sorted[idx_c]
        r_g = bound_r[idx_c]
        member = (
            (idx < n_pad)
            & active_rank[idx_c]
            & (d_g + r_g >= lo_bound[:, None])
            & (d_g - r_g < hi_bound[:, None])
        )
        g = order[idx_c]  # (n_slab, M_cap) original ids
        means_s = scene.means[g]
        scales_s = scene.scales[g]
        quats_s = scene.quats[g]
        op_s = jnp.where(member, scene.opacities[g], 0.0)
        sh_s = scene.sh[g]

        def local_exact(means_l, scales_l, quats_l, op_l, sh_l, lo_l, hi_l):
            scene_l = GaussianScene(
                means=means_l[0], scales=scales_l[0], quats=quats_l[0],
                opacities=op_l[0], sh=sh_l[0], num_active=M_cap,
            )
            table, binning, dirs_t, _ = prepare_frame(
                scene_l, camera, config, pair_capacity
            )
            rgb_t, alpha_t = march_frame(
                binning.cand, dirs_t, camera.eye, table, config, tile_chunk,
                depth_gate=(w_hat, lo_l[0], hi_l[0]),
            )
            rgb_all = jax.lax.all_gather(rgb_t, GAUSS_AXIS)  # (S, T, R, 3)
            t_all = jax.lax.all_gather(1.0 - alpha_t, GAUSS_AXIS)
            return combine_slab_segments(rgb_all, t_all)

        rgb_t, t_total = shard_map(
            local_exact,
            mesh=mesh,
            in_specs=(P(GAUSS_AXIS),) * 7,
            out_specs=(P(), P()),
            check_vma=False,
        )(means_s, scales_s, quats_s, op_s, sh_s, lo_bound, hi_bound)
    elif straddle == "slab":
        if pair_capacity is None:
            pair_capacity = default_pair_capacity(slab)
        n_dropped = jnp.zeros((), jnp.int32)
        sorted_scene = GaussianScene(
            means=scene.means[order],
            scales=scene.scales[order],
            quats=scene.quats[order],
            opacities=jnp.where(
                jnp.arange(order.shape[0]) < N, scene.opacities[order], 0.0
            ),
            sh=scene.sh[order],
            num_active=scene.num_gaussians,
        )  # (keeps its own `order`: shared with the straddle="exact" branch)

        def local(scene_l):
            table, binning, dirs_t, _ = prepare_frame(
                scene_l, camera, config, pair_capacity
            )
            rgb_t, alpha_t = march_frame(
                binning.cand, dirs_t, camera.eye, table, config, tile_chunk
            )
            t_l = 1.0 - alpha_t  # (T, R) slab transmittance
            rgb_all = jax.lax.all_gather(rgb_t, GAUSS_AXIS)  # (S, T, R, 3)
            t_all = jax.lax.all_gather(t_l, GAUSS_AXIS)
            return combine_slab_segments(rgb_all, t_all)

        scene_spec = GaussianScene(
            means=P(GAUSS_AXIS), scales=P(GAUSS_AXIS), quats=P(GAUSS_AXIS),
            opacities=P(GAUSS_AXIS), sh=P(GAUSS_AXIS), num_active=scene.num_gaussians,
        )
        rgb_t, t_total = shard_map(
            local,
            mesh=mesh,
            in_specs=(scene_spec,),
            out_specs=(P(), P()),
            check_vma=False,
        )(sorted_scene)
    else:
        raise ValueError(f"unknown straddle mode {straddle!r}")

    origins, dirs, valid = generate_rays(camera, config)
    H, W_px = camera.height, camera.width
    rgb = untile_image(rgb_t, H, W_px, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_total)[..., None], H, W_px, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha, "n_straddle_dropped": n_dropped}


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "pair_capacity", "tile_chunk"),
)
def render_gaussian_ring(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    pair_capacity: int | None = None,
    tile_chunk: int = 16,
):
    """Depth-slab gaussian partitioning with RAY RING EXCHANGE.

    The ring-attention analog for volume rendering (SURVEY.md section 5,
    long-context): device d owns depth slab d AND ray-tile block d. Each
    round, every device marches the incoming ray block against its LOCAL
    slab, folds the (radiance, transmittance) segment into the block's
    carried partials, and ppermutes the block one step around the ring —
    n_dev rounds visit every (block, slab) pair with NO all_gather: peak
    per-device memory is one slab + one ray block, i.e. 1/n_dev of both,
    versus render_gaussian_sharded_fast whose fold gathers all slabs'
    (T, R) partials on every device.

    Ordering: block b visits slabs b, b+1, ..., n-1, 0, ..., b-1. The
    compositing fold is associative over DEPTH-ORDERED segments, so the
    block carries TWO partials — 'back' accumulating slabs [b, n-1] and
    'front' accumulating the wrapped slabs [0, b-1], each folded in
    ascending depth order — combined once (front then back) at the end.
    After the n-th permute every block is home; outputs shard over the
    tile axis.
    """
    from gaussian_ray_tracing_tpu.models.tiled import (
        default_pair_capacity,
        march_frame,
        prepare_frame,
        tile_rays,
        untile_image,
    )

    n = mesh.shape[GAUSS_AXIS]
    N = scene.num_gaussians
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(-(-N // n))

    # contiguous view-depth slabs (as render_gaussian_sharded_fast)
    sorted_scene = _slab_sorted_scene(scene, camera, n)

    origins, dirs, valid = generate_rays(camera, config)
    H, W_px = camera.height, camera.width
    dirs_all = tile_rays(dirs, config.tile_w, config.tile_h)  # (T, R, 3)
    T = dirs_all.shape[0]
    R = dirs_all.shape[1]
    T_local = -(-T // n)
    pad_t = n * T_local - T
    if pad_t:
        dirs_all = jnp.pad(dirs_all, ((0, pad_t), (0, 0), (0, 0)))
    perm = [(i, (i + 1) % n) for i in range(n)]

    def local(scene_l, dirs_p):
        # bin MY slab over ALL tiles once (binning is ray-block independent)
        table, binning, _, _ = prepare_frame(scene_l, camera, config, pair_capacity)
        cand_p = binning.cand
        if pad_t:
            cand_p = jnp.pad(cand_p, ((0, pad_t), (0, 0)), constant_values=-1)
        s = jax.lax.axis_index(GAUSS_AXIS)

        blk = jax.lax.dynamic_slice_in_dim(dirs_p, s * T_local, T_local, 0)
        f32 = jnp.float32
        f_rgb = jnp.zeros((T_local, R, 3), f32)
        f_t = jnp.ones((T_local, R), f32)
        b_rgb = jnp.zeros((T_local, R, 3), f32)
        b_t = jnp.ones((T_local, R), f32)

        def round_k(k, carry):
            blk, f_rgb, f_t, b_rgb, b_t = carry
            b = (s - k) % n  # id of the block currently on this device
            cand_b = jax.lax.dynamic_slice_in_dim(cand_p, b * T_local, T_local, 0)
            rgb_l, alpha_l = march_frame(
                cand_b, blk, camera.eye, table, config, tile_chunk
            )
            t_l = 1.0 - alpha_l
            fb = s >= b  # scalar: this slab folds into the back partial
            f_rgb = jnp.where(fb, f_rgb, f_rgb + f_t[..., None] * rgb_l)
            f_t = jnp.where(fb, f_t, f_t * t_l)
            b_rgb = jnp.where(fb, b_rgb + b_t[..., None] * rgb_l, b_rgb)
            b_t = jnp.where(fb, b_t * t_l, b_t)
            shift = lambda x: jax.lax.ppermute(x, GAUSS_AXIS, perm)
            return (shift(blk), shift(f_rgb), shift(f_t),
                    shift(b_rgb), shift(b_t))

        blk, f_rgb, f_t, b_rgb, b_t = jax.lax.fori_loop(
            0, n, round_k, (blk, f_rgb, f_t, b_rgb, b_t)
        )
        # depth order is front segment [0, b-1] then back segment [b, n-1]
        rgb = f_rgb + f_t[..., None] * b_rgb
        t_tot = f_t * b_t
        return rgb, t_tot

    scene_spec = GaussianScene(
        means=P(GAUSS_AXIS), scales=P(GAUSS_AXIS), quats=P(GAUSS_AXIS),
        opacities=P(GAUSS_AXIS), sh=P(GAUSS_AXIS), num_active=scene.num_gaussians,
    )
    rgb_t, t_total = shard_map(
        local,
        mesh=mesh,
        in_specs=(scene_spec, P()),
        out_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS)),
        check_vma=False,
    )(sorted_scene, dirs_all)

    rgb_t = rgb_t[:T]
    t_total = t_total[:T]
    rgb = untile_image(rgb_t, H, W_px, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_total)[..., None], H, W_px, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}


def _slab_sorted_scene(scene: GaussianScene, camera: Camera, n: int):
    """Contiguous view-depth slabs: depth-argsort the scene and zero the
    padding tail's opacity (invisible anywhere). Shared by the tiled and
    Pallas slab renderers."""
    N = scene.num_gaussians
    U, V, W = camera.uvw_frame()
    w_hat = W / jnp.maximum(jnp.linalg.norm(W), 1e-12)
    depth = (scene.means - camera.eye) @ w_hat
    order = jnp.argsort(depth)
    pad = (-N) % n
    if pad:
        order = jnp.concatenate([order, order[-1:].repeat(pad)])
    return GaussianScene(
        means=scene.means[order],
        scales=scene.scales[order],
        quats=scene.quats[order],
        opacities=jnp.where(
            jnp.arange(order.shape[0]) < N, scene.opacities[order], 0.0
        ),
        sh=scene.sh[order],
        num_active=scene.num_gaussians,
    )


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "pair_capacity", "chunk", "interpret",
                     "comm"),
)
def render_pallas_slabs(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
    comm: str = "ring",
):
    """Depth-slab gaussian partitioning on the FUSED PALLAS march.

    The production kernel's variant of render_gaussian_sharded_fast /
    render_gaussian_ring: device d owns contiguous view-depth slab d and
    runs the FULL Pallas pipeline over it — per-slab feature table,
    footprints, pair binning, feature gather and the fused march kernel
    are all 1/n_dev sized (no stage is replicated beyond the O(N) depth
    argsort that defines the slabs).

    comm="gather": each device marches ALL image tiles against its slab,
    then one all_gather + ordered front-to-back segment fold combines the
    (n, T, R) partials (combine_slab_segments).

    comm="ring": ray-tile block d starts on device d and ppermutes one
    step per round (the ring-attention analog, SURVEY.md section 5): each
    round marches the resident block against the LOCAL slab's pair-stream
    segments for those tiles and folds the (radiance, transmittance)
    segment into the block's carried partials. Peak memory is one slab +
    one T/n ray block per device and the comm is n-1 ppermutes of
    (T/n, R) partials instead of an all_gather of (n, T, R). Block b
    visits slabs in rotated order b, b+1, ..., n-1, 0, ..., b-1, so it
    carries TWO depth-ordered partials (back = slabs >= b, front =
    wrapped slabs < b) combined once at the end; vs comm="gather" the
    only float difference is that final front*back regrouping (~1 ulp).

    Returns {"rgb", "alpha", "n_dropped", "pairs_max_shard", "n_pairs"}:
    pairs_max_shard is the largest per-device emitted pair count — the
    1/n_dev binning-scaling witness asserted in tests/test_parallel.py.
    """
    from gaussian_ray_tracing_tpu.models.pallas_renderer import (
        _interpret_default,
        prepare_pair_stream,
    )
    from gaussian_ray_tracing_tpu.models.tiled import default_pair_capacity
    from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
    from gaussian_ray_tracing_tpu.ops.tiles import num_tiles

    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))
    n = mesh.shape[GAUSS_AXIS]
    N = scene.num_gaussians
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(-(-N // n))
    if comm not in ("ring", "gather"):
        raise ValueError(f"unknown comm {comm!r}")

    sorted_scene = _slab_sorted_scene(scene, camera, n)

    origins, dirs, valid = generate_rays(camera, config)
    H, W_px = camera.height, camera.width
    dirs_all = tile_rays(dirs, config.tile_w, config.tile_h)  # (T, R, 3)
    tx_n, ty_n = num_tiles(camera, config)
    T = tx_n * ty_n
    R = config.rays_per_tile
    T_local = -(-T // n)
    pad_t = n * T_local - T
    if pad_t:
        dirs_all = jnp.pad(dirs_all, ((0, pad_t), (0, 0), (0, 0)))
    perm = [(i, (i + 1) % n) for i in range(n)]
    eye = jnp.asarray(camera.eye, jnp.float32)

    def _prep(scene_l):
        # per-slab Pallas frame prep: O(N/n) table + footprints, O(P/n)
        # binning/sort/gather. packed16 stays off: the slab fold needs the
        # same feature numerics on CPU-mesh tests and TPU.
        stream, pair_feats, _table, _br = prepare_pair_stream(
            scene_l, camera, config, pair_capacity, chunk, packed16=False
        )
        return stream, pair_feats

    def local_gather(scene_l, dirs_p):
        stream, pair_feats = _prep(scene_l)
        starts_p = (
            jnp.concatenate([
                stream.starts,
                jnp.broadcast_to(stream.starts[-1:], (pad_t,)),
            ]) if pad_t else stream.starts
        )
        rgb_l, t_l = pallas_march_stream(
            starts_p, eye, pair_feats, dirs_p, config,
            n_tiles=n * T_local, rays_per_tile=R,
            chunk=chunk, interpret=interpret, quad=True,
        )
        rgb_all = jax.lax.all_gather(rgb_l, GAUSS_AXIS)  # (S, T', R, 3)
        t_all = jax.lax.all_gather(t_l, GAUSS_AXIS)
        rgb_t, t_tot = combine_slab_segments(rgb_all, t_all)
        return (rgb_t, t_tot, jax.lax.psum(stream.n_dropped, GAUSS_AXIS),
                jax.lax.pmax(stream.n_pairs, GAUSS_AXIS),
                jax.lax.psum(stream.n_pairs, GAUSS_AXIS))

    def local_ring(scene_l, dirs_p):
        stream, pair_feats = _prep(scene_l)
        starts_p = (
            jnp.concatenate([
                stream.starts,
                jnp.broadcast_to(stream.starts[-1:], (pad_t,)),
            ]) if pad_t else stream.starts
        )
        s = jax.lax.axis_index(GAUSS_AXIS)
        blk = jax.lax.dynamic_slice_in_dim(dirs_p, s * T_local, T_local, 0)
        f32 = jnp.float32
        f_rgb = jnp.zeros((T_local, R, 3), f32)
        f_t = jnp.ones((T_local, R), f32)
        b_rgb = jnp.zeros((T_local, R, 3), f32)
        b_t = jnp.ones((T_local, R), f32)

        def round_k(k, carry):
            blk, f_rgb, f_t, b_rgb, b_t = carry
            b = (s - k) % n  # id of the block currently on this device
            starts_b = jax.lax.dynamic_slice_in_dim(
                starts_p, b * T_local, T_local + 1, 0
            )
            rgb_l, t_l = pallas_march_stream(
                starts_b, eye, pair_feats, blk, config,
                n_tiles=T_local, rays_per_tile=R, chunk=chunk,
                interpret=interpret, quad=True,
            )
            fb = s >= b  # scalar: this slab folds into the back partial
            f_rgb = jnp.where(fb, f_rgb, f_rgb + f_t[..., None] * rgb_l)
            f_t = jnp.where(fb, f_t, f_t * t_l)
            b_rgb = jnp.where(fb, b_rgb + b_t[..., None] * rgb_l, b_rgb)
            b_t = jnp.where(fb, b_t * t_l, b_t)
            shift = lambda x: jax.lax.ppermute(x, GAUSS_AXIS, perm)
            return (shift(blk), shift(f_rgb), shift(f_t),
                    shift(b_rgb), shift(b_t))

        blk, f_rgb, f_t, b_rgb, b_t = jax.lax.fori_loop(
            0, n, round_k, (blk, f_rgb, f_t, b_rgb, b_t)
        )
        rgb = f_rgb + f_t[..., None] * b_rgb
        t_tot = f_t * b_t
        return (rgb, t_tot, jax.lax.psum(stream.n_dropped, GAUSS_AXIS),
                jax.lax.pmax(stream.n_pairs, GAUSS_AXIS),
                jax.lax.psum(stream.n_pairs, GAUSS_AXIS))

    scene_spec = GaussianScene(
        means=P(GAUSS_AXIS), scales=P(GAUSS_AXIS), quats=P(GAUSS_AXIS),
        opacities=P(GAUSS_AXIS), sh=P(GAUSS_AXIS),
        num_active=scene.num_gaussians,
    )
    out_tile_spec = P(GAUSS_AXIS) if comm == "ring" else P()
    rgb_t, t_total, n_dropped, pairs_max, n_pairs = shard_map(
        local_ring if comm == "ring" else local_gather,
        mesh=mesh,
        in_specs=(scene_spec, P()),
        out_specs=(out_tile_spec, out_tile_spec, P(), P(), P()),
        check_vma=False,
    )(sorted_scene, dirs_all)

    rgb_t = rgb_t[:T]
    t_total = t_total[:T]
    rgb = untile_image(rgb_t, H, W_px, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_total)[..., None], H, W_px, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha, "n_dropped": n_dropped,
            "pairs_max_shard": pairs_max, "n_pairs": n_pairs}


@partial(
    jax.jit,
    static_argnames=("config", "mesh", "pair_capacity", "chunk", "interpret"),
)
def render_pallas_sharded_diff(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Differentiable ray-DP forward on the fused Pallas kernels.

    Tiles shard over 'rays'; each device runs the forward march AND, on the
    backward pass, the hand-written reverse-sweep kernel over its own tile
    range. The replicated per-pair feature stream's gradient is psum'd
    across shards by shard_map's transpose — the gradient all-reduce over
    ICI that BASELINE config 5 mandates, overlapped with the backward sweep
    by XLA's async collectives.
    """
    from gaussian_ray_tracing_tpu.models.pallas_renderer import (
        _interpret_default,
        prepare_pair_stream,
    )
    from gaussian_ray_tracing_tpu.models.tiled import (
        default_pair_capacity,
        tile_rays,
        untile_image,
    )
    from gaussian_ray_tracing_tpu.ops.pallas_march import march_stream_diff
    from gaussian_ray_tracing_tpu.ops.tiles import num_tiles

    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    if config.order not in ("key", "window"):
        config = config.replace(order="key")
    n_dev = mesh.shape[RAY_AXIS]
    R = config.rays_per_tile

    stream, pair_feats, _, _ = prepare_pair_stream(
        scene, camera, config, pair_capacity, chunk
    )
    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)
    tx_n, ty_n = num_tiles(camera, config)
    T = tx_n * ty_n
    T_local = -(-T // n_dev)
    pad_t = n_dev * T_local - T
    if pad_t:
        dirs_t = jnp.pad(dirs_t, ((0, pad_t), (0, 0), (0, 0)))
    starts_full = jnp.concatenate(
        [stream.starts, jnp.full((pad_t,), stream.starts[T], jnp.int32)]
    )
    shard_starts = jnp.stack(
        [
            jax.lax.dynamic_slice(starts_full, (d * T_local,), (T_local + 1,))
            for d in range(n_dev)
        ]
    )

    def local(starts_l, dirs_l, feats_l, eye_l):
        return march_stream_diff(
            starts_l[0], eye_l, feats_l, dirs_l,
            config, T_local, R, chunk, interpret,
        )

    rgb_t, t_final = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(), P()),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )(shard_starts, dirs_t.reshape(n_dev * T_local, R, 3), pair_feats,
      camera.eye.astype(jnp.float32))

    H, W = camera.height, camera.width
    rgb = untile_image(rgb_t[:T], H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        (1.0 - t_final[:T])[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha}
