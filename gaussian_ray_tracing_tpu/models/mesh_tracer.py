"""Secondary-ray tracer: gaussians + inserted triangle meshes with bounces.

Replaces the reference's per-pixel global-memory traceState machine
(src/Parameters.h:87-93, shaders/tracer.cuh:75-92) with ordinary batched
control flow: a bounded bounce loop over the whole ray batch, each iteration
doing a mesh closest-hit sweep then a gaussian segment march, carrying the
same payload the raygen loop carries (shaders/tracer.cu:17-110):
accumColor, accumAlpha, directLight, blockingRadiance, numBounces, and the
cross-segment gaussian transmittance (rayData.density,
shaders/tracer.cuh:334,372).

Semantics per bounce (shaders/tracer.cu:59-106):
  - mesh MISS -> final gaussian pass over [t_min, t_max]:
        directLight = radiance_seg * density_total
        accumAlpha  = clamp(accumAlpha + density_total)
        terminate
  - mesh HIT  -> gaussian pass over [t_min, t_hit]:
        accumColor += (1 - accumAlpha) * radiance_seg
        accumAlpha  = clamp(accumAlpha + density_total)
        blockingRadiance = clamp(blockingRadiance + density_total)
        continue with reflected/refracted ray (MIRROR: tracer.cu:171-172;
        GLASS: tracer.cuh:432-482), or terminate after compositing the
        normal color (NORMAL: tracer.cuh:406-429)
  - both paths then add directLight * (1 - blockingRadiance).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import MeshType, RenderConfig
from gaussian_ray_tracing_tpu.models.oracle import render_rays_oracle
from gaussian_ray_tracing_tpu.ops.intersect import closest_hit, reflect, refract_or_tir
from gaussian_ray_tracing_tpu.ops.pallas_march import pallas_march_stream
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.scene.mesh import TriangleMesh


def _surface_interaction(
    d, normal, hit_t, has_hit, face, face_types,
    rgb_seg, density_total, accum_color, accum_alpha,
    bounces, config: RenderConfig, glass_ratio,
):
    """Vectorized per-ray surface response with PER-FACE material types.

    Reproduces the reference's three closest-hit behaviors (MIRROR
    tracer.cu:171-172, GLASS tracer.cuh:432-482, NORMAL tracer.cuh:406-429)
    but selected per ray by the hit face's type instead of one global
    switch — mirror/glass/normal primitives can coexist in a scene (an
    extension; the reference keys the whole scene to one MeshType,
    src/Parameters.h:80-85). face_types None, or -1 entries, defer to
    config.mesh_type.

    Shapes: `...` is the ray batch (flat (R,) or tiled (T, R)).
    Returns (new_d, new_bounces, t_shift, terminate_hit, accum_color,
    accum_alpha) — the NORMAL-mode compositing is applied here, after the
    caller's generic hit accumulation, exactly as the branchy version did.
    """
    if face_types is None:
        t_id = jnp.full(has_hit.shape, int(config.mesh_type), jnp.int32)
    else:
        t_id = face_types[jnp.maximum(face, 0)]
        t_id = jnp.where(t_id < 0, jnp.int32(int(config.mesh_type)), t_id)
    is_m = t_id == int(MeshType.MIRROR)
    is_g = t_id == int(MeshType.GLASS)
    is_n = t_id == int(MeshType.NORMAL)

    mirror_d = reflect(d, normal)
    glass_d, reflected = refract_or_tir(d, normal, glass_ratio)
    new_d = jnp.where(
        is_n[..., None], d, jnp.where(is_g[..., None], glass_d, mirror_d)
    )
    new_bounces = bounces + jnp.where(
        is_m, 1, jnp.where(is_g, reflected.astype(jnp.int32), 0)
    )
    t_shift = hit_t + jnp.where(
        is_g & ~reflected, config.refraction_eps_shift, 0.0
    )
    terminate_hit = has_hit & is_n

    # NORMAL: replace the generic radiance with renderNormal's composite
    # (gaussian segment + normal color at remaining transmittance) and
    # saturate alpha (tracer.cuh:406-429)
    norm_hit = terminate_hit
    normal_color = (normal + 1.0) * 0.5
    add = rgb_seg + normal_color * (1.0 - density_total)[..., None]
    accum_color = jnp.where(
        norm_hit[..., None],
        accum_color - (1.0 - accum_alpha)[..., None] * rgb_seg + add,
        accum_color,
    )
    accum_alpha = jnp.where(
        norm_hit,
        jnp.clip(accum_alpha + (1.0 - density_total), 0.0, 1.0),
        accum_alpha,
    )
    return new_d, new_bounces, t_shift, terminate_hit, accum_color, accum_alpha


def _interp_normal(mesh_n, faces, hit):
    n0 = mesh_n[faces[hit.face][:, 0]]
    n1 = mesh_n[faces[hit.face][:, 1]]
    n2 = mesh_n[faces[hit.face][:, 2]]
    w0 = (1.0 - hit.u - hit.v)[:, None]
    n = w0 * n0 + hit.u[:, None] * n1 + hit.v[:, None] * n2
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def render_rays_with_mesh(
    scene: GaussianScene,
    mesh: TriangleMesh,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    config: RenderConfig,
    loop_bound: int = 8,
    ray_chunk: int = 4096,
):
    """Trace a flat ray batch through mesh bounces + gaussian segments.

    loop_bound caps batched bounce iterations (the reference's per-ray loop
    runs to MAX_BOUNCES=32 / TIMEOUT=1000, tracer.cuh:12-13; scenes needing
    more than `loop_bound` surface interactions per ray should raise it).

    The whole bounce loop runs per ray chunk (lax.map) so triangle-intersect
    intermediates of shape (rays, faces, 3) stay bounded regardless of frame
    size.
    """
    R_total = origins.shape[0]
    if R_total > ray_chunk:
        pad = (-R_total) % ray_chunk
        if pad:
            z = jnp.zeros((pad, 3), origins.dtype)
            origins = jnp.concatenate([origins, z], 0)
            dirs = jnp.concatenate([dirs, z], 0)
        n_chunks = origins.shape[0] // ray_chunk
        rgb, alpha = jax.lax.map(
            lambda args: render_rays_with_mesh(
                scene, mesh, args[0], args[1], config,
                loop_bound=loop_bound, ray_chunk=ray_chunk,
            ),
            (
                origins.reshape(n_chunks, ray_chunk, 3),
                dirs.reshape(n_chunks, ray_chunk, 3),
            ),
        )
        return rgb.reshape(-1, 3)[:R_total], alpha.reshape(-1)[:R_total]

    R = origins.shape[0]
    wv = mesh.world_vertices()
    wn = mesh.world_normals()
    faces = mesh.faces
    v0, v1, v2 = wv[faces[:, 0]], wv[faces[:, 1]], wv[faces[:, 2]]

    glass_ratio = config.glass_ior / config.air_ior

    def body(i, state):
        (o, d, accum_color, accum_alpha, direct_light, blocking, bounces, trans, done) = state
        # transmittance-dead rays contribute exactly nothing downstream:
        # the march gates every weight on p_excl > min_transmittance
        # (shaders/tracer.cuh:341), so rgb_seg = 0 and every later
        # accumulation term is 0 (direct_light = 0 * density; NORMAL's
        # normal_color * trans <= minT < 1/2 RGB8 step). Dropping them
        # here skips their mesh sweeps and gaussian segments entirely.
        live = (
            (~done)
            & (jnp.sum(d * d, axis=-1) > 0.01)
            & (bounces < config.max_bounces)
            & (trans > config.min_transmittance)
        )

        hit = closest_hit(o, d, v0, v1, v2, config.mesh_t_min, config.mesh_t_max)
        has_hit = hit.hit & live

        normal = _interp_normal(wn, faces, hit)

        # gaussian segment: [t_min, t_hit] on mesh hit, [t_min, t_max] on miss
        seg_hi = jnp.where(has_hit, hit.t, config.t_max)
        rgb_seg, _, t_next = render_rays_oracle(
            scene,
            o,
            jnp.where(live[:, None], d, 0.0),
            config,
            t_lo=config.t_min,
            t_hi=seg_hi,
            t0=trans,
            ray_chunk=ray_chunk,
        )
        density_total = 1.0 - t_next  # rayData.density (cumulative)

        # --- miss -> last gaussian pass (tracer.cu:68-83) ---
        miss = live & ~has_hit
        direct_light = jnp.where(miss[:, None], rgb_seg * density_total[:, None], direct_light)
        accum_alpha = jnp.where(miss, jnp.clip(accum_alpha + density_total, 0.0, 1.0), accum_alpha)

        # --- hit -> mid-bounce accumulation (tracer.cu:84-99) ---
        accum_color = jnp.where(
            has_hit[:, None], accum_color + (1.0 - accum_alpha)[:, None] * rgb_seg, accum_color
        )
        accum_alpha = jnp.where(has_hit, jnp.clip(accum_alpha + density_total, 0.0, 1.0), accum_alpha)
        blocking = jnp.where(has_hit, jnp.clip(blocking + density_total, 0.0, 1.0), blocking)

        # --- surface interaction (per-face material types) ---
        (new_d, new_bounces, t_shift, terminate_hit,
         accum_color, accum_alpha) = _surface_interaction(
            d, normal, hit.t, has_hit, hit.face, mesh.face_types,
            rgb_seg, density_total, accum_color, accum_alpha,
            bounces, config, glass_ratio,
        )

        # both paths: accumColor += directLight * (1 - blockingRadiance)
        # (tracer.cu:101); on the final miss iteration blocking holds its
        # pre-miss value, matching the reference ordering
        accum_color = jnp.where(
            live[:, None], accum_color + direct_light * (1.0 - blocking)[:, None], accum_color
        )

        o = jnp.where(has_hit[:, None], o + t_shift[:, None] * d, o)
        d = jnp.where(has_hit[:, None] & ~terminate_hit[:, None], new_d, jnp.zeros_like(d))
        bounces = jnp.where(has_hit, new_bounces, bounces)
        trans = t_next
        done = done | miss | terminate_hit | (~live)
        return (o, d, accum_color, accum_alpha, direct_light, blocking, bounces, trans, done)

    zero3 = jnp.zeros((R, 3), jnp.float32)
    zero = jnp.zeros((R,), jnp.float32)
    state = (
        origins,
        dirs,
        zero3,  # accumColor
        zero,  # accumAlpha
        zero3,  # directLight
        zero,  # blockingRadiance
        jnp.zeros((R,), jnp.int32),
        jnp.ones((R,), jnp.float32),  # transmittance carry (1 - density)
        jnp.zeros((R,), bool),
    )
    state = jax.lax.fori_loop(0, loop_bound, body, state)
    accum_color, accum_alpha = state[2], state[3]
    return accum_color, accum_alpha


@partial(jax.jit, static_argnames=("config", "loop_bound", "ray_chunk"))
def render_with_mesh_oracle(
    scene: GaussianScene,
    mesh: TriangleMesh,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    loop_bound: int = 8,
    ray_chunk: int = 4096,
):
    """Full-frame mesh render on the exact brute-force oracle (reference
    semantics, O(rays x gaussians) per bounce — CPU / small-scene tool)."""
    origins, dirs, valid = generate_rays(camera, config)
    H, W = dirs.shape[:2]
    rgb, alpha = render_rays_with_mesh(
        scene,
        mesh,
        origins.reshape(-1, 3),
        dirs.reshape(-1, 3),
        config,
        loop_bound=loop_bound,
        ray_chunk=ray_chunk,
    )
    rgb = jnp.clip(rgb.reshape(H, W, 3), 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha.reshape(H, W), 0.0)
    return {"rgb": rgb, "alpha": alpha}


@partial(
    jax.jit,
    static_argnames=(
        "config", "loop_bound", "pair_capacity", "block_capacity", "chunk",
        "interpret",
    ),
)
def render_with_mesh_fast(
    scene: GaussianScene,
    mesh: TriangleMesh,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    loop_bound: int = 4,
    pair_capacity: int | None = None,
    block_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Full-frame mesh render on the fused Pallas march.

    Bounce 0 (primary rays, shared eye) marches the screen-space pair
    stream with a per-ray t_hi at the mesh hit (tracer.cu:84-99). Bounced
    segments (arbitrary origins/dirs) march morton blocks culled per tile
    by an origin-sphere + direction-cone bound (ops/blocks.py) with per-ray
    origins and carry-in transmittance — the TPU-native analog of tracing
    secondary rays through the reference's shared BVH (tracer.cu:59-106).
    Ordering within bounced segments is near-to-far block order refined by
    the kernel's per-ray window sort.
    """
    import jax as _jax

    from gaussian_ray_tracing_tpu.models.pallas_renderer import (
        _interpret_default,
        prepare_pair_stream,
    )
    from gaussian_ray_tracing_tpu.models.tiled import (
        default_pair_capacity,
        tile_rays,
        untile_image,
    )
    from gaussian_ray_tracing_tpu.ops.blocks import (
        block_stream,
        build_block_index,
        bundle_rays,
        cull_blocks,
    )
    from gaussian_ray_tracing_tpu.ops.tiles import num_tiles

    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)

    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * ty_n
    R = config.rays_per_tile
    if block_capacity is None:
        # a HARD per-tile budget of bounce_block_budget near-to-far blocks
        # (block_stream max_per_tile): the capacity clip can then never
        # starve a tile. Measured need on the adversarial 100k mirror
        # scene: median 11, mean 17 blocks/tile — the clamp drops only
        # the farthest blocks of the heaviest tiles, which early
        # termination rarely reaches.
        block_capacity = n_tiles * chunk * config.bounce_block_budget
    block_capacity = (block_capacity // chunk) * chunk

    from gaussian_ray_tracing_tpu.ops.pallas_tri import (
        FACES_PER_BLOCK,
        face_block_index,
        pack_triangles,
        pallas_closest_hit,
    )

    stream, pair_feats, table128, bound_radius = prepare_pair_stream(
        scene, camera, config, pair_capacity, chunk
    )
    index = build_block_index(scene.means, bound_radius, block_size=chunk)
    sorted_table = jnp.pad(table128[index.perm], ((0, chunk), (0, 0)))

    origins, dirs, valid = generate_rays(camera, config)
    H, W = dirs.shape[:2]
    t2 = lambda x: tile_rays(x[..., None], config.tile_w, config.tile_h)[..., 0]
    t3 = lambda x: tile_rays(x, config.tile_w, config.tile_h)
    d_t = t3(dirs)
    o_t = jnp.broadcast_to(camera.eye, d_t.shape)

    wv = mesh.world_vertices()
    wn = mesh.world_normals()
    faces = mesh.faces
    v0, v1, v2 = wv[faces[:, 0]], wv[faces[:, 1]], wv[faces[:, 2]]
    glass_ratio = config.glass_ior / config.air_ior

    # morton-packed triangle blocks + bounding spheres for the per-tile
    # cone-culled Pallas closest-hit kernel (ops/pallas_tri.py)
    face_rows, tri_perm = pack_triangles(v0, v1, v2)
    findex = face_block_index(v0, v1, v2, tri_perm)
    n_fblocks = findex.centers.shape[0]
    face_capacity = n_tiles * FACES_PER_BLOCK * min(16, n_fblocks)
    n_faces = faces.shape[0]

    zero3 = jnp.zeros((n_tiles, R, 3), jnp.float32)
    zero = jnp.zeros((n_tiles, R), jnp.float32)
    state = (
        o_t, d_t,
        zero3, zero,  # accum_color, accum_alpha
        zero3, zero,  # direct_light, blocking
        jnp.zeros((n_tiles, R), jnp.int32),  # bounces
        jnp.ones((n_tiles, R), jnp.float32),  # trans
        jnp.zeros((n_tiles, R), bool),  # done
        jnp.zeros((), jnp.int32),  # dropped block slots (quality telemetry)
    )

    from gaussian_ray_tracing_tpu.ops.intersect import MeshHit

    def bounce_body(state, first: bool):
        (o_t, d_t, accum_color, accum_alpha, direct_light, blocking,
         bounces, trans, done, drops) = state
        live = (
            (~done)
            & (jnp.sum(d_t * d_t, axis=-1) > 0.01)
            & (bounces < config.max_bounces)
            # bounce liveness at the chunk-skip threshold (round-5): rays
            # whose carried transmittance is at or below it can add at most
            # that much per channel (the march kernel would skip their
            # chunks anyway) — retiring them here also shrinks the ray
            # BUNDLES, so the block cull's cones tighten and later bounces
            # stream fewer morton blocks. Same bounded-error semantics as
            # chunk_skip_transmittance; equality tests pin both to
            # min_transmittance.
            & (trans > max(config.min_transmittance,
                           config.chunk_skip_transmittance))
        )
        d_live = jnp.where(live[..., None], d_t, 0.0)
        fbundles = bundle_rays(o_t, d_live)
        fvis = cull_blocks(findex, fbundles, config.mesh_t_max)
        fstream = block_stream(
            fvis, findex, fbundles, face_capacity,
            max_per_tile=max(1, face_capacity // (n_tiles * FACES_PER_BLOCK)),
        )
        t_hit, fpk, hu, hv = pallas_closest_hit(
            fstream.starts, fstream.blk, face_rows, d_live, camera.eye,
            config.mesh_t_min, config.mesh_t_max, n_tiles, R,
            origins_t=o_t, interpret=interpret,
        )
        face = jnp.where(
            (fpk >= 0) & (fpk < n_faces),
            tri_perm[jnp.clip(fpk, 0, n_faces - 1)].astype(jnp.int32),
            -1,
        )
        hit = MeshHit(t=t_hit, face=face, u=hu, v=hv)
        has_hit = (hit.face >= 0) & live
        seg_hi = jnp.where(has_hit, hit.t, config.t_max)
        drops = drops + fstream.n_dropped

        if first:
            rgb_t, t_next = pallas_march_stream(
                stream.starts, camera.eye.astype(jnp.float32), pair_feats,
                d_live, config, n_tiles=n_tiles, rays_per_tile=R, chunk=chunk,
                interpret=interpret, t_hi=seg_hi, t0=trans, quad=True,
            )
        else:
            bundles = bundle_rays(o_t, d_live)
            # per-tile t cap: nothing beyond the tile's farthest live
            # segment end can contribute (glass interiors are short)
            t_cap = jnp.max(jnp.where(live, seg_hi, 0.0), axis=-1)
            visible = cull_blocks(index, bundles, t_cap)
            bstream = block_stream(
                visible, index, bundles, block_capacity,
                max_per_tile=max(1, block_capacity // (n_tiles * chunk)),
            )
            drops = drops + bstream.n_dropped
            bsub = max(1, config.bounce_blocks_per_chunk)
            rgb_t, t_next = pallas_march_stream(
                bstream.starts, camera.eye.astype(jnp.float32), sorted_table,
                d_live,
                config.replace(order=config.bounce_order),
                n_tiles=n_tiles, rays_per_tile=R, chunk=chunk * bsub,
                interpret=interpret, origins_t=o_t, t_hi=seg_hi, t0=trans,
                block_offsets=bstream.blk, block_sub=bsub,
                # per-ray-origin QUAD (tile-centered expansion) measured
                # SLOWER here on chip despite ~40% fewer (c, R) ops —
                # 88.6 vs 67.6 ms march1 (PERF.md round 5; the 12 extra
                # loop-carried (1, R) monomial registers likely spill).
                # quad=False stays the block-march configuration.
            )
        rgb_seg = rgb_t
        density_total = 1.0 - t_next

        # --- miss -> last gaussian pass (tracer.cu:68-83) ---
        miss = live & ~has_hit
        direct_light = jnp.where(
            miss[..., None], rgb_seg * density_total[..., None], direct_light
        )
        accum_alpha = jnp.where(
            miss, jnp.clip(accum_alpha + density_total, 0.0, 1.0), accum_alpha
        )

        # --- hit -> mid-bounce accumulation (tracer.cu:84-99) ---
        accum_color = jnp.where(
            has_hit[..., None],
            accum_color + (1.0 - accum_alpha)[..., None] * rgb_seg,
            accum_color,
        )
        accum_alpha = jnp.where(
            has_hit, jnp.clip(accum_alpha + density_total, 0.0, 1.0), accum_alpha
        )
        blocking = jnp.where(
            has_hit, jnp.clip(blocking + density_total, 0.0, 1.0), blocking
        )

        normal = _interp_normal(wn, faces, jax.tree.map(lambda x: x.reshape(-1), hit))
        normal = normal.reshape(n_tiles, R, 3)

        (new_d, new_bounces, t_shift, terminate_hit,
         accum_color, accum_alpha) = _surface_interaction(
            d_t, normal, hit.t, has_hit, hit.face, mesh.face_types,
            rgb_seg, density_total, accum_color, accum_alpha,
            bounces, config, glass_ratio,
        )

        accum_color = jnp.where(
            live[..., None],
            accum_color + direct_light * (1.0 - blocking)[..., None],
            accum_color,
        )

        o_t = jnp.where(has_hit[..., None], o_t + t_shift[..., None] * d_t, o_t)
        d_t = jnp.where(
            has_hit[..., None] & ~terminate_hit[..., None],
            new_d,
            jnp.zeros_like(d_t),
        )
        bounces = jnp.where(has_hit, new_bounces, bounces)
        trans = t_next
        done = done | miss | terminate_hit | (~live)
        return (o_t, d_t, accum_color, accum_alpha, direct_light, blocking,
                bounces, trans, done, drops)

    state = bounce_body(state, True)
    for _ in range(1, loop_bound):
        # skip whole dead iterations at runtime (e.g. a mirror scene
        # finishes in 2 bounces while loop_bound=4: the triangle pass,
        # block cull/stream, and the march of the dead rounds all vanish)
        def _any_live(s):
            return jnp.any(
                (~s[8]) & (jnp.sum(s[1] * s[1], axis=-1) > 0.01)
                & (s[6] < config.max_bounces)
                & (s[7] > config.min_transmittance)
            )

        state = jax.lax.cond(
            _any_live(state),
            lambda s: bounce_body(s, False),
            lambda s: s,
            state,
        )
    (o_t, d_t, accum_color, accum_alpha, direct_light, blocking,
     bounces, trans, done, drops) = state

    rgb = untile_image(accum_color, H, W, config.tile_w, config.tile_h)
    alpha = untile_image(
        accum_alpha[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha,
            "aux": {"block_dropped": drops, "pair_dropped": stream.n_dropped}}


def planar_mirror_plane(mesh: TriangleMesh, config: RenderConfig):
    """Detect a single planar MIRROR rectangle (the reference's headline
    demo shape, src/geometry/Primitives.cpp:6-61 + MIRROR mode).

    Returns a dict of static plane data (unit normal n, offset d, in-plane
    basis b1/b2, rect bounds) when the mesh's active faces are coplanar,
    all effectively MIRROR, and the triangles tile their own in-plane
    bounding rectangle (so point-in-rect is an exact hit test); else None.
    Runs on CONCRETE arrays only (host-side dispatch, not under jit).
    """
    import numpy as np

    try:
        wv = np.asarray(mesh.world_vertices())
    except jax.errors.TracerArrayConversionError:
        return None
    faces = np.asarray(mesh.faces)[: mesh.num_faces]
    if faces.shape[0] == 0:
        return None
    if mesh.face_types is None:
        if int(config.mesh_type) != int(MeshType.MIRROR):
            return None
    else:
        ft = np.asarray(mesh.face_types)[: mesh.num_faces]
        eff = np.where(ft < 0, int(config.mesh_type), ft)
        if not (eff == int(MeshType.MIRROR)).all():
            return None
    v0, v1, v2 = wv[faces[:, 0]], wv[faces[:, 1]], wv[faces[:, 2]]
    cr = np.cross(v1 - v0, v2 - v0)
    areas = 0.5 * np.linalg.norm(cr, axis=-1)
    if (areas < 1e-12).any():
        return None
    n0 = cr[np.argmax(areas)]
    n0 = n0 / np.linalg.norm(n0)
    # coplanarity of every active vertex
    used = np.unique(faces.reshape(-1))
    pv = wv[used]
    d0 = float(np.median(pv @ n0))
    scale_ref = max(1.0, float(np.abs(pv).max()))
    if np.abs(pv @ n0 - d0).max() > 1e-4 * scale_ref:
        return None
    # in-plane rect bounds + full-coverage check (sum of tri areas must
    # tile the bbox, else the rect test would over-report hits)
    e = v1[0] - v0[0]
    b1 = e - float(e @ n0) * n0
    b1 = b1 / np.linalg.norm(b1)
    b2 = np.cross(n0, b1)
    c1, c2 = pv @ b1, pv @ b2
    lo1, hi1, lo2, hi2 = c1.min(), c1.max(), c2.min(), c2.max()
    bbox_area = (hi1 - lo1) * (hi2 - lo2)
    if bbox_area <= 0 or abs(areas.sum() - bbox_area) > 1e-3 * bbox_area:
        return None
    return dict(
        n=np.asarray(n0, np.float32), d=np.float32(d0),
        b1=np.asarray(b1, np.float32), b2=np.asarray(b2, np.float32),
        lo1=np.float32(lo1), hi1=np.float32(hi1),
        lo2=np.float32(lo2), hi2=np.float32(hi2),
    )


@partial(
    jax.jit,
    static_argnames=("config", "pair_capacity", "chunk", "interpret",
                     "n", "d", "b1", "b2", "lo1", "hi1", "lo2", "hi2"),
)
def render_with_mesh_planar_mirror(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    n, d, b1, b2, lo1, hi1, lo2, hi2,  # static plane data (python floats)
    pair_capacity: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
):
    """Planar-mirror fast path: the bounce-1 march is a REFLECTED PINHOLE
    FRAME, not a morton-block sweep.

    All rays reflected off a plane mirror pass through the reflected eye
    e' = M_r eye (M_r = reflection across the plane), with the SAME focal
    |d| per pixel — so the bounce segment can be binned with the cheap
    screen-space pair stream of a mirrored camera and marched with per-ray
    [t_hit + t_min, t_max] windows and the primary segment's transmittance
    carry. A look-at camera cannot represent the det=-1 reflected frame
    (cross products force det=+1), so the mirror camera is built with
    up' = M_r up, which lands the reflection of primary pixel (x, y) at
    mirror pixel (W-1-x, y): a pure x-flip, applied to the carried
    image-space arrays. Gaussians entirely on the far side of the mirror
    (never reachable by reflected rays) are dropped before binning.
    Semantics identical to render_with_mesh_fast's MIRROR bookkeeping
    (shaders/tracer.cu:59-106); a plane-reflected ray can never re-hit
    the same plane, so bounce 1 is every hit ray's final gaussian pass.
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
    from gaussian_ray_tracing_tpu.ops.response import adaptive_radius
    from gaussian_ray_tracing_tpu.ops.tiles import num_tiles

    if interpret is None:
        interpret = _interpret_default()
    if chunk is None:
        chunk = max(32, min(config.march_chunk, 256))
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(scene.num_gaussians)
    nv = jnp.asarray(n, jnp.float32)
    b1v = jnp.asarray(b1, jnp.float32)
    b2v = jnp.asarray(b2, jnp.float32)

    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * ty_n
    R = config.rays_per_tile
    H, W = camera.height, camera.width
    t3 = lambda x: tile_rays(x, config.tile_w, config.tile_h)
    t2 = lambda x: t3(x[..., None])[..., 0]

    # --- primary pass: analytic plane rectangle closest-hit -------------
    origins, dirs, valid = generate_rays(camera, config)
    eye = jnp.asarray(camera.eye, jnp.float32)
    ndot = dirs @ nv  # (H, W)
    live0 = jnp.sum(dirs * dirs, axis=-1) > 0.01
    t_plane = (d - eye @ nv) / jnp.where(
        jnp.abs(ndot) > 1e-12, ndot, jnp.inf
    )
    p_hit = eye + t_plane[..., None] * dirs
    c1 = p_hit @ b1v
    c2 = p_hit @ b2v
    hit = (
        live0
        & (t_plane >= config.mesh_t_min)
        & (t_plane <= config.mesh_t_max)
        & (c1 >= lo1) & (c1 <= hi1) & (c2 >= lo2) & (c2 <= hi2)
    )

    stream, pair_feats, _t, _b = prepare_pair_stream(
        scene, camera, config, pair_capacity, chunk
    )
    seg_hi = jnp.where(hit, t_plane, config.t_max)
    rgb0_t, t0_t = pallas_march_stream(
        stream.starts, eye, pair_feats, t3(dirs), config,
        n_tiles=n_tiles, rays_per_tile=R, chunk=chunk, interpret=interpret,
        t_hi=t2(seg_hi), quad=True,
    )
    rgb0 = untile_image(rgb0_t, H, W, config.tile_w, config.tile_h)
    t_after0 = untile_image(
        t0_t[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0]
    density0 = 1.0 - t_after0

    # --- bounce 1: mirrored-camera frame --------------------------------
    refl = lambda p: p - 2.0 * (p @ nv - d) * nv
    m_r = lambda v: v - 2.0 * (v @ nv) * nv
    eye_m = refl(eye)
    cam_m = Camera.create(
        eye=eye_m, lookat=refl(jnp.asarray(camera.lookat, jnp.float32)),
        up=m_r(jnp.asarray(camera.up, jnp.float32)),
        fov_y_deg=camera.fov_y_deg, width=W, height=H,
    )
    # drop gaussians wholly on the mirror's far side (t_lo can never
    # reach them): reflected rays march only the eye-side halfspace
    side = jnp.sign(eye @ nv - d)
    bound_r = adaptive_radius(scene.opacities, config.alpha_min) * jnp.max(
        scene.scales, axis=-1
    )
    behind = side * (scene.means @ nv - d) < -bound_r
    scene_m = GaussianScene(
        means=scene.means, scales=scene.scales, quats=scene.quats,
        opacities=jnp.where(behind, 0.0, scene.opacities), sh=scene.sh,
        num_active=scene.num_gaussians,
    )
    stream_m, feats_m, _t2, _b2 = prepare_pair_stream(
        scene_m, cam_m, config, pair_capacity, chunk
    )
    _o_m, dirs_m, _v_m = generate_rays(cam_m, config)
    flip = lambda img: img[:, ::-1]
    hit_m = flip(hit)
    # same |d| per mirrored pixel => same t parameter: window starts at
    # the plane hit + t_min (tracer.cu:84-99 marches [t_min, t_hit] then
    # restarts the bounced ray at t_min past the new origin)
    t_lo_m = jnp.where(hit_m, flip(t_plane) + config.t_min, jnp.inf)
    t0_m = jnp.where(hit_m, flip(t_after0), 0.0)
    rgb1_t, t1_t = pallas_march_stream(
        stream_m.starts, jnp.asarray(cam_m.eye, jnp.float32), feats_m,
        t3(dirs_m), config, n_tiles=n_tiles, rays_per_tile=R, chunk=chunk,
        interpret=interpret, t_lo=t2(t_lo_m), t0=t2(t0_m), quad=True,
    )
    rgb1 = flip(untile_image(rgb1_t, H, W, config.tile_w, config.tile_h))
    t_after1 = flip(untile_image(
        t1_t[..., None], H, W, config.tile_w, config.tile_h
    )[..., 0])
    density1 = 1.0 - t_after1  # cumulative (carry t0 = t_after0)

    # --- bookkeeping, exactly render_with_mesh_fast's mask arithmetic ---
    # miss rays: bounce-0 march was their final pass
    miss = live0 & ~hit
    rgb = jnp.where(
        miss[..., None], rgb0 * density0[..., None], 0.0
    )
    alpha = jnp.where(miss, density0, 0.0)
    # hit rays: mid-bounce accumulation then the bounce-1 final pass
    blocking = jnp.clip(density0, 0.0, 1.0)
    rgb = jnp.where(
        hit[..., None],
        rgb0 + rgb1 * density1[..., None] * (1.0 - blocking)[..., None],
        rgb,
    )
    alpha = jnp.where(
        hit, jnp.clip(jnp.clip(density0, 0.0, 1.0) + density1, 0.0, 1.0),
        alpha,
    )
    rgb = jnp.clip(rgb, 0.0, 1.0)
    rgb = jnp.where(valid[..., None], rgb, 0.0)
    alpha = jnp.where(valid, alpha, 0.0)
    return {"rgb": rgb, "alpha": alpha,
            "aux": {"pair_dropped": stream.n_dropped + stream_m.n_dropped}}


def render_with_mesh(
    scene: GaussianScene,
    mesh: TriangleMesh,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    **kw,
):
    """Full-frame render with secondary-ray mesh effects.

    Dispatches to the Pallas fast path on TPU (or when config.use_pallas)
    — with a reflected-frame specialization when the mesh is one planar
    MIRROR rectangle — else to the exact oracle path (CPU tests / small
    scenes)."""
    import jax as _jax

    if config.use_pallas or _jax.default_backend() == "tpu":
        plane = planar_mirror_plane(mesh, config)
        if plane is not None and "loop_bound" not in kw:
            return render_with_mesh_planar_mirror(
                scene, camera, config,
                n=tuple(float(x) for x in plane["n"]),
                d=float(plane["d"]),
                b1=tuple(float(x) for x in plane["b1"]),
                b2=tuple(float(x) for x in plane["b2"]),
                lo1=float(plane["lo1"]), hi1=float(plane["hi1"]),
                lo2=float(plane["lo2"]), hi2=float(plane["hi2"]),
                **kw,
            )
        return render_with_mesh_fast(scene, mesh, camera, config, **kw)
    return render_with_mesh_oracle(scene, mesh, camera, config, **kw)
