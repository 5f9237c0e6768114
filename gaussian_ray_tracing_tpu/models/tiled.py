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
from gaussian_ray_tracing_tpu.ops.response import (
    adaptive_radius,
    canonical_frames,
    ray_ellipsoid_span,
)
from gaussian_ray_tracing_tpu.ops.sh import SH_C0, num_coeffs, sh_basis
from gaussian_ray_tracing_tpu.ops.tiles import (
    TileBinning,
    bin_tiles,
    project_footprints_conic,
)
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


def _oddeven_perm(key: jnp.ndarray, passes: int) -> jnp.ndarray:
    """Permutation from `passes` odd-even transposition passes over the last
    axis (ascending). Exact when every element is displaced <= passes from
    its sorted position; a nearly-sorted input needs few passes."""
    m = key.shape[-1]
    idx = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32), key.shape
    )
    pos = jnp.arange(m, dtype=jnp.int32)
    for p in range(passes):
        kr = jnp.roll(key, -1, axis=-1)
        ir = jnp.roll(idx, -1, axis=-1)
        # compare-exchange (i, i+1) for i of parity p
        swap_hi = (pos % 2 == p % 2) & (pos < m - 1) & (key > kr)
        swap_lo = jnp.roll(swap_hi, 1, axis=-1)
        key = jnp.where(swap_hi, kr, jnp.where(swap_lo, jnp.roll(key, 1, axis=-1), key))
        idx = jnp.where(swap_hi, ir, jnp.where(swap_lo, jnp.roll(idx, 1, axis=-1), idx))
    return idx


def march_tile_chunk(
    cand: jnp.ndarray,  # (Tc, M_cap)
    dirs: jnp.ndarray,  # (Tc, R, 3)
    eye: jnp.ndarray,  # (3,)
    gfeats: dict,  # pre-gathered per-slot (Tc, M_cap) arrays (unpack_columns)
    config: RenderConfig,
    depth_gate=None,  # optional (w_hat (3,), lo, hi): keep only hits whose
    #             event view-depth z = t_event * (w_hat . d) is in [lo, hi)
    #             — the straddler-exact depth-slab decomposition
    #             (parallel/sharded.render_gaussian_sharded_fast)
):
    """March a chunk of tiles through their candidate lists.

    TPU layout note: every (tile, ray, candidate) intermediate is a rank-3
    (Tc, R, mc) array whose last axis maps onto the 128 vector lanes. The
    xyz vector math is scalarized into separate per-component arrays -- a
    trailing length-3 axis would be lane-padded to 128 by XLA, a 42x memory
    blowup that makes the frame HBM-bound by orders of magnitude. Colors
    contract over candidates / SH coefficients with batched matmuls (MXU)
    instead of carrying per-hit (..., 3) color tensors.
    """
    Tc, m_cap = cand.shape
    R = dirs.shape[1]
    mc = min(config.march_chunk, m_cap)
    n_steps = -(-m_cap // mc)
    dtype = jnp.dtype(config.compute_dtype)

    dx = dirs[..., 0].astype(dtype)  # (Tc, R)
    dy = dirs[..., 1].astype(dtype)
    dz = dirs[..., 2].astype(dtype)
    live = dx * dx + dy * dy + dz * dz > 0.01  # |dir| > 0.1 guard (tracer.cu:59)
    eye_c = eye.astype(dtype)

    sh_deg = config.sh_degree
    n_coeffs = num_coeffs(sh_deg)
    basis = sh_basis(dx, dy, dz, sh_deg) if sh_deg > 0 else None  # (Tc, R, K)

    if depth_gate is not None:
        w_hat, gate_lo, gate_hi = depth_gate
        w_hat = w_hat.astype(dtype)
        # per-ray view-depth rate (primary rays share the eye, so the event
        # view depth is t_event * (w_hat . d))
        wdot = dx * w_hat[0] + dy * w_hat[1] + dz * w_hat[2]  # (Tc, R)

    def step(carry, xs):
        t_carry, racc, gacc, bacc = carry  # (Tc, R) each
        ids, gf = xs
        present = ids >= 0  # (Tc, mc)

        m = [gf[f"m{k}"].astype(dtype) for k in range(9)]  # rows of S^-1 R^T
        ox = eye_c[0] - gf["mx"].astype(dtype)  # (Tc, mc)
        oy = eye_c[1] - gf["my"].astype(dtype)
        oz = eye_c[2] - gf["mz"].astype(dtype)
        op = gf["op"].astype(dtype)
        rad = gf["rad"].astype(dtype)

        # canonical-space origin offset o_g = M (eye - mu), shared by the
        # tile's rays (primary rays share the eye)
        ogx = m[0] * ox + m[1] * oy + m[2] * oz  # (Tc, mc)
        ogy = m[3] * ox + m[4] * oy + m[5] * oz
        ogz = m[6] * ox + m[7] * oy + m[8] * oz

        # d_g = M d per (ray, candidate): rank-1 outer-product accumulation
        ex_r = lambda a: a[:, :, None]  # (Tc, R) -> (Tc, R, 1)
        ex_m = lambda a: a[:, None, :]  # (Tc, mc) -> (Tc, 1, mc)
        dgx = ex_m(m[0]) * ex_r(dx) + ex_m(m[1]) * ex_r(dy) + ex_m(m[2]) * ex_r(dz)
        dgy = ex_m(m[3]) * ex_r(dx) + ex_m(m[4]) * ex_r(dy) + ex_m(m[5]) * ex_r(dz)
        dgz = ex_m(m[6]) * ex_r(dx) + ex_m(m[7]) * ex_r(dy) + ex_m(m[8]) * ex_r(dz)

        dd = dgx * dgx + dgy * dgy + dgz * dgz  # (Tc, R, mc)
        od = ex_m(ogx) * dgx + ex_m(ogy) * dgy + ex_m(ogz) * dgz
        oo = ex_m(ogx * ogx + ogy * ogy + ogz * ogz)  # (Tc, 1, mc)

        t_star = -od / jnp.maximum(dd, 1e-6)
        pp = oo + t_star * (2.0 * od + t_star * dd)  # |o_g + t* d_g|^2
        resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
        alpha = jnp.minimum(config.alpha_clamp, resp * ex_m(op))

        # iso-ellipsoid event time within [t_min, t_max] (oracle hit rule)
        cq = oo - ex_m(rad * rad)
        disc = od * od - dd * cq
        hit = disc >= 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv_dd = 1.0 / jnp.maximum(dd, 1e-12)
        t_entry = (-od - sq) * inv_dd
        t_exit = (-od + sq) * inv_dd
        t_event = jnp.where(t_entry < config.t_min, t_exit, t_entry)
        in_window = (t_event >= config.t_min) & (t_event <= config.t_max)
        valid = ex_m(present) & hit & in_window & live[..., None]
        if depth_gate is not None:
            # slab ownership by per-ray event view depth: each event is
            # composited by exactly one slab, and slab index is monotone in
            # t_event per ray, so the cross-slab fold is exactly ordered
            z = t_event * wdot[..., None]
            valid = valid & (z >= gate_lo) & (z < gate_hi)

        # gated effective alpha (composite_depth_ordered semantics, inlined
        # so the weights stay rank-3 (Tc, R, mc))
        gate = valid & (alpha > config.alpha_min)
        if config.hit_multiplicity == 1:
            a_eff = alpha
        else:
            a_eff = 1.0 - (1.0 - alpha) ** config.hit_multiplicity
        a = jnp.where(gate, a_eff, 0.0)

        if config.order in ("window", "oddeven"):
            # per-ray re-sort of this chunk by exact event t: bounded-window
            # exact ordering (inversions wider than march_chunk remain).
            # Weights are computed in sorted order then scattered back so the
            # color contraction below stays in candidate order.
            # "oddeven" runs a fixed number of odd-even transposition passes
            # instead of a full sort: the stream is already globally ordered
            # by the per-tile depth key, so per-ray inversions are mostly
            # local and k passes fix displacements up to k (this is the
            # scheme the Pallas kernel uses; exposed here for parity tests
            # and quality/cost tuning).
            order_t = t_star if config.window_key == "peak" else t_event
            sort_key = jnp.where(valid, order_t, jnp.inf)
            if config.order == "oddeven":
                perm = _oddeven_perm(sort_key, config.window_passes)
            else:
                perm = jnp.argsort(sort_key, axis=-1)
            a_s = jnp.take_along_axis(a, perm, axis=-1)
            p_incl = jnp.cumprod(1.0 - a_s, axis=-1) * t_carry[..., None]
            p_excl = jnp.concatenate([t_carry[..., None], p_incl[..., :-1]], axis=-1)
            w_s = a_s * p_excl * (p_excl > config.min_transmittance)
            inv_perm = jnp.argsort(perm, axis=-1)
            w = jnp.take_along_axis(w_s, inv_perm, axis=-1)
        else:
            p_incl = jnp.cumprod(1.0 - a, axis=-1) * t_carry[..., None]
            p_excl = jnp.concatenate([t_carry[..., None], p_incl[..., :-1]], axis=-1)
            w = a * p_excl * (p_excl > config.min_transmittance)

        # sequential early-termination transmittance (see ops/composite.py)
        below = p_incl <= config.min_transmittance
        frozen = jnp.max(jnp.where(below, p_incl, -jnp.inf), axis=-1)
        t_next = jnp.where(jnp.any(below, axis=-1), frozen, p_incl[..., -1])
        t_next = jnp.where(t_carry > config.min_transmittance, t_next, t_carry)

        # per-channel color contraction over candidates
        accs = []
        for ch, acc in (("sh_r", racc), ("sh_g", gacc), ("sh_b", bacc)):
            if sh_deg == 0:
                col = jnp.maximum(0.5 + SH_C0 * gf[f"{ch}_0"].astype(dtype), 0.0)
                accs.append(acc + jnp.einsum("trm,tm->tr", w, col))
            else:
                shc = jnp.stack(
                    [gf[f"{ch}_{k}"].astype(dtype) for k in range(n_coeffs)], -1
                )  # (Tc, mc, K)
                col = jnp.maximum(0.5 + jnp.einsum("trk,tmk->trm", basis, shc), 0.0)
                accs.append(acc + jnp.sum(w * col, axis=-1))

        return (t_next, *accs), None

    # remat: the backward pass recomputes each chunk's (Tc, R, mc) work
    # arrays instead of saving them across the scan (without this a 512^2
    # training step wants ~25 GB of saved activations; with it, gradients
    # fit in HBM at ~2x forward flops — the flash-attention-style tradeoff)
    step = jax.checkpoint(step)

    pad = n_steps * mc - m_cap
    to_chunks = lambda x, fill: jnp.transpose(
        (jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill) if pad else x)
        .reshape(Tc, n_steps, mc),
        (1, 0, 2),
    )
    xs = (to_chunks(cand, -1), {k: to_chunks(v, 0) for k, v in gfeats.items()})
    init = (
        jnp.ones((Tc, R), dtype),
        jnp.zeros((Tc, R), dtype),
        jnp.zeros((Tc, R), dtype),
        jnp.zeros((Tc, R), dtype),
    )
    (t_final, r, g, b), _ = jax.lax.scan(step, init, xs)
    return jnp.stack([r, g, b], axis=-1), 1.0 - t_final


def feature_table(scene: GaussianScene, config: RenderConfig, eye=None):
    """Packed per-gaussian feature table (N, 14+3K) float32.

    Columns: [mx, my, mz, m00..m22 (rows of M = S^-1 R^T), opacity,
    iso radius, sh_r[0..K-1], sh_g[0..K-1], sh_b[0..K-1]].

    With `eye` (shared primary-ray origin), per-gaussian QUADRATIC-FORM
    columns are appended at fixed indices 64..79 (the table is padded to
    128 lanes for the kernel DMA anyway): with Q = M^T M and rel = eye - mu,

      64..69: q00, q11, q22, q01, q02, q12   (Q is symmetric)
      72..74: v = Q rel
      75:     cq = rel^T Q rel - radius^2
      76:     oo = rel^T Q rel
      77..79: cr, cg, cb = max(0.5 + C0*sh0, 0)  (sh_degree 0 only)

    These turn the march's per-(candidate, ray) response math into two tiny
    MXU matmuls (see ops/pallas_march._march_kernel quad path):
    dd = d^T Q d = q . [dx2, dy2, dz2, 2dxdy, 2dxdz, 2dydz] and
    od = rel^T Q d = v . d, replacing ~25 VPU broadcast ops per chunk.

    One packed table means the per-frame candidate feature fetch is a
    SINGLE row gather: TPU row gathers are row-count-bound (1..128 columns
    cost the same), while per-feature gathers are ~50x slower in aggregate.
    """
    M = canonical_frames(scene.scales, scene.quats)
    radius = adaptive_radius(scene.opacities, config.alpha_min)
    k = num_coeffs(config.sh_degree)
    cols = [
        scene.means,
        M.reshape(-1, 9),
        scene.opacities[:, None],
        radius[:, None],
        scene.sh[:, :k, 0],
        scene.sh[:, :k, 1],
        scene.sh[:, :k, 2],
    ]
    table = jnp.concatenate(cols, axis=1)
    if eye is not None:
        F = table.shape[1]
        if F > QUAD_Q0:
            raise ValueError(
                f"feature table width {F} collides with quad columns at "
                f"{QUAD_Q0}; lower sh_degree or move QUAD_Q0"
            )
        Q = jnp.einsum("nki,nkj->nij", M, M)  # (N, 3, 3) = M^T M
        rel = jnp.asarray(eye, jnp.float32)[None, :] - scene.means  # (N, 3)
        v = jnp.einsum("nij,nj->ni", Q, rel)
        oo = jnp.sum(rel * v, axis=-1)
        cq = oo - radius * radius
        n = table.shape[0]
        z1 = jnp.zeros((n, 1), jnp.float32)
        quad = [
            Q[:, 0, 0, None], Q[:, 1, 1, None], Q[:, 2, 2, None],
            Q[:, 0, 1, None], Q[:, 0, 2, None], Q[:, 1, 2, None],
            z1, z1,  # 70, 71
            v,  # 72..74
            cq[:, None], oo[:, None],  # 75, 76
        ]
        if config.sh_degree == 0:
            rgb0 = jnp.maximum(0.5 + SH_C0 * scene.sh[:, 0, :], 0.0)  # (N, 3)
            quad.append(rgb0)  # 77..79
        table = jnp.concatenate(
            [table, jnp.zeros((n, QUAD_Q0 - F), jnp.float32), *quad], axis=1
        )
    return table, M, radius


# fixed column indices of the quadratic-form block (see feature_table)
QUAD_Q0 = 64  # q00,q11,q22,q01,q02,q12 at 64..69 (+2 pad)
QUAD_V0 = 72  # vx,vy,vz at 72..74
QUAD_CQ = 75
QUAD_OO = 76
QUAD_RGB = 77  # cr,cg,cb at 77..79 (sh_degree 0)

# compact 64-column layout of the int16 bit-split table (packed16 path)
P16_OP = 0
P16_Q0 = 1   # q00,q11,q22,q01,q02,q12 at 1..6
P16_V0 = 7   # vx,vy,vz
P16_CQ = 10
P16_OO = 11
P16_SH0 = 12  # rgb0 (sh_degree 0) or 3K SH coeffs (<= 48: 12+48 = 60 <= 64)


def feature_table_packed16(table: jnp.ndarray, config: RenderConfig):
    """Quad-only view of a feature table, EXACT f32 as int16 hi/lo halves.

    The production render's pair gather is BANDWIDTH-bound (PERF.md:
    f32 (P, 128) rows gather at 4.66 ms, 2-byte rows at 2.54), and the
    quad response path reads at most 60 of the 128 f32 columns. This
    packs those 60 into 64 compact f32 columns and stores each as two
    int16 lanes (hi bits at lane k, lo bits at lane 64 + k): rows shrink
    to 256 B with NO precision loss (bit-exact f32 round-trip in the
    kernel, ops/pallas_march._march_kernel packed16 decode) — bf16 halves
    were rejected because od's cancellation needs full f32 (PERF.md).

    `table` must come from feature_table(..., eye=...) (quad columns
    present). Returns (N, 128) int16.
    """
    k = num_coeffs(config.sh_degree)
    cols = [
        table[:, 12:13],  # op
        table[:, QUAD_Q0:QUAD_Q0 + 6],
        table[:, QUAD_V0:QUAD_V0 + 3],
        table[:, QUAD_CQ:QUAD_CQ + 1],
        table[:, QUAD_OO:QUAD_OO + 1],
    ]
    if config.sh_degree == 0:
        cols.append(table[:, QUAD_RGB:QUAD_RGB + 3])
    else:
        cols.append(table[:, 14:14 + 3 * k])  # sh coeffs
    compact = jnp.concatenate(cols, axis=1)
    F = compact.shape[1]
    if F > 64:
        raise ValueError(f"packed16 layout overflow: {F} > 64 columns")
    if F < 64:
        compact = jnp.pad(compact, ((0, 0), (0, 64 - F)))
    bits = jax.lax.bitcast_convert_type(compact, jnp.int32)
    hi = jax.lax.shift_right_arithmetic(bits, 16).astype(jnp.int16)
    lo = (bits & jnp.int32(0xFFFF)).astype(jnp.int16)
    return jnp.concatenate([hi, lo], axis=1)


def unpack_columns(g: jnp.ndarray, n_coeffs: int) -> dict:
    """Split gathered feature rows (..., F) into per-feature (...,) arrays
    (compact layouts: no trailing short axes survive into the march)."""
    out = {
        "mx": g[..., 0], "my": g[..., 1], "mz": g[..., 2],
        "op": g[..., 12], "rad": g[..., 13],
    }
    for i in range(9):
        out[f"m{i}"] = g[..., 3 + i]
    for c, name in enumerate(("sh_r", "sh_g", "sh_b")):
        for k in range(n_coeffs):
            out[f"{name}_{k}"] = g[..., 14 + c * n_coeffs + k]
    return out


def prepare_frame(
    scene: GaussianScene,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
):
    """Frame setup shared by the local and sharded renderers: the packed
    feature table, tile binning, and per-tile ray directions."""
    table, M, radius = feature_table(scene, config)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = project_footprints_conic(
        scene.means, scene.scales, scene.quats, radius, bound_radius,
        camera, config,
    )
    # global depth key matching the oracle's per-ray event rule evaluated on
    # the central ray through each gaussian (entry t, or exit t when the
    # camera sits inside the iso ellipsoid) -- far better ordering than view
    # depth for near/enclosing gaussians
    rel = scene.means - camera.eye
    rho = jnp.maximum(jnp.linalg.norm(rel, axis=-1), 1e-9)
    hit, t_in, t_out = ray_ellipsoid_span(
        scene.means, M, radius, camera.eye, rel / rho[:, None]
    )
    key = jnp.where(t_in >= config.t_min, t_in, t_out)
    key = jnp.where(hit, key, rho)  # radius-0 (invisible) entries: any key
    fp = fp._replace(depth=key)
    geom = (scene.means, M.reshape(-1, 9), radius)
    binning: TileBinning = bin_tiles(fp, camera, config, pair_capacity, geom=geom)
    if binning.order is not None:
        # pre-sorted binning returns depth-RANK candidate ids; align the
        # feature table (an N-row gather — cheap, and its autodiff
        # transpose routes gradients back to the original rows)
        table = table[binning.order]

    origins, dirs, valid = generate_rays(camera, config)
    dirs_t = tile_rays(dirs, config.tile_w, config.tile_h)  # (T, R, 3)
    return table, binning, dirs_t, valid


def march_frame(cand, dirs_t, eye, table, config: RenderConfig, tile_chunk: int,
                depth_gate=None):
    """March every tile (chunked): (T, M_cap) + (T, R, 3) -> rgb/alpha tiles.

    Fetches all candidate features with one packed row gather up front, then
    the chunked march is gather-free (pure slicing). `depth_gate` (see
    march_tile_chunk) restricts composited events to a view-depth interval.
    """
    T, m_cap = cand.shape
    n_chunks = -(-T // tile_chunk)
    pad_t = n_chunks * tile_chunk - T
    cand_p = jnp.pad(cand, ((0, pad_t), (0, 0)), constant_values=-1) if pad_t else cand
    dirs_p = jnp.pad(dirs_t, ((0, pad_t), (0, 0), (0, 0))) if pad_t else dirs_t

    gathered = table[jnp.maximum(cand_p, 0)]  # (T', m_cap, F)
    gfeats = unpack_columns(gathered, num_coeffs(config.sh_degree))

    def chunk_fn(args):
        cand_c, dirs_c, gf_c = args
        return march_tile_chunk(cand_c, dirs_c, eye, gf_c, config,
                                depth_gate=depth_gate)

    rgb_t, alpha_t = jax.lax.map(
        chunk_fn,
        (
            cand_p.reshape(n_chunks, tile_chunk, -1),
            dirs_p.reshape(n_chunks, tile_chunk, dirs_t.shape[1], 3),
            {k: v.reshape(n_chunks, tile_chunk, m_cap) for k, v in gfeats.items()},
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
