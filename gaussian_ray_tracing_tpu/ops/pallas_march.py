"""Fused Pallas march/composite kernel over the sorted pair stream.

This is the TPU replacement for the reference's per-pixel OptiX traversal +
anyhit k-buffer + segment-march loop (shaders/tracer.cu:124-153,
shaders/tracer.cuh:328-373). One grid program per image tile:

  - the tile's candidates are a CONTIGUOUS, depth-ordered segment of the
    sorted pair stream (ops/tiles.bin_pairs), located by the scalar-prefetched
    `starts` array — no per-tile capacity, no padding slots, empty tiles do
    zero chunk iterations;
  - candidate features stream HBM -> VMEM through a hand-rolled
    double-buffered async-DMA pipeline in chunks of `c` pairs;
  - all work arrays are (c, R): candidates on sublanes, rays on lanes.
    Per-candidate feature columns are (c, 1) slices and per-ray values are
    (1, R) rows, so every broadcast is layout-free (no transposes anywhere);
  - the front-to-back compositing recurrence is evaluated as an exclusive
    prefix product along the candidate axis via exp(L @ log1p(-a)) with a
    strictly-lower-triangular ones matrix on the MXU — bit-equivalent to the
    reference's sequential march in the produced weights (see
    ops/composite.py for the equivalence argument), chunk-size independent
    because the transmittance carry chains exactly;
  - early termination: once every ray in the tile has transmittance below
    min_transmittance (shaders/tracer.cuh:341), remaining chunks skip all
    compute (DMA still streams; bandwidth is cheap, VPU/MXU time is not).

Differentiable: march_stream_diff pairs this forward with a HAND-WRITTEN
backward kernel (_march_bwd_kernel) that re-marches each tile in reverse
and emits per-pair feature gradients — in BOTH key order and the
parity-grade window order (the backward re-runs the forward's unique-key
bitonic sort and inverts it with a second sort keyed on the source index
embedded in the key's low 8 bits). The XLA tiled path (models/tiled.py)
remains the autodiff fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.ops.sh import SH_C0, num_coeffs, sh_basis_list

# feature-table column indices (models/tiled.feature_table)
_MX, _MY, _MZ = 0, 1, 2
_M0 = 3  # m00..m22 -> columns 3..11
_OP, _RAD = 12, 13
_SH0 = 14  # sh_r[0..K-1], sh_g[...], sh_b[...]
# quadratic-form block (models/tiled.feature_table with eye): Q = M^T M
_Q0 = 64  # q00,q11,q22,q01,q02,q12 (+2 pad) -> 64..71
_V0 = 72  # v = Q (eye - mu) -> 72..74 (rows 75..79 of the od matmul RHS
#           are zero, so sharing the 72:80 slice with cq/oo/rgb is safe)
_CQ, _OO = 75, 76
_RGB0 = 77  # max(0.5 + C0*sh0, 0) per channel (sh_degree 0)
# compact int16 bit-split layout (models/tiled.feature_table_packed16)
_P16_OP, _P16_Q0, _P16_V0, _P16_CQ, _P16_OO, _P16_SH0 = 0, 1, 7, 10, 11, 12


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Circular roll along the candidate (sublane) axis (jnp.roll semantics:
    out[i] = in[i - shift]; pltpu.roll only accepts non-negative shifts)."""
    c = x.shape[0]
    return pltpu.roll(x, shift % c, axis=0)


def _tri_dot(tri_bf: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(c, c) 0/1-triangular @ (c, R) at f32-grade accuracy on the bf16 MXU.

    A plain f32 matmul runs the MXU at ~1/8 rate; splitting x into bf16
    hi + bf16 residual and accumulating two bf16 passes in f32 recovers
    ~2^-16 relative accuracy (the mask matrix is exact in bf16) at ~4x the
    f32-matmul throughput. Used for every prefix-sum contraction in the
    march and its backward."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return jnp.dot(tri_bf, hi, preferred_element_type=f32) + jnp.dot(
        tri_bf, lo, preferred_element_type=f32
    )


def _prefix_prod_excl(v: jnp.ndarray, cand_idx: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix product along the candidate (sublane) axis:
    out[i] = v[0] * ... * v[i-1], 1 at i = 0. Hillis-Steele doubling —
    log2(c) (roll, select, multiply) steps, no transcendentals and no MXU
    operand conversion (vs the exp(L @ log1p) form: log1p + bf16 hi/lo
    split + two matmuls + exp). Direct f32 products of factors in (0, 1]
    are also strictly MORE accurate than the exp/log round-trip."""
    c = v.shape[0]
    y = jnp.where(cand_idx >= 1, _roll(v, 1), 1.0)
    d = 1
    while d < c:
        y = y * jnp.where(cand_idx >= d + 1, _roll(y, d), 1.0)
        d *= 2
    return y


def _running_max_excl(x: jnp.ndarray, cand_idx: jnp.ndarray) -> jnp.ndarray:
    """Exclusive running max along the candidate (sublane) axis: out[i] =
    max(x[0..i-1]), -inf at i = 0. log2(c) masked-roll steps (the circular
    wrap is neutralized by masking rolled-in lanes to -inf)."""
    c = x.shape[0]
    ninf = jnp.float32(-jnp.inf)
    y = jnp.where(cand_idx >= 1, _roll(x, 1), ninf)
    d = 1
    while d < c:
        # Hillis-Steele doubling: y[i] covers x[max(0, i-2d) .. i-1] after
        # this step; y[i-d] is defined (exclusive) only for i-d >= 1
        y = jnp.maximum(y, jnp.where(cand_idx >= d + 1, _roll(y, d), ninf))
        d *= 2
    return y


def _running_min_excl_rev(x: jnp.ndarray, cand_idx: jnp.ndarray) -> jnp.ndarray:
    """REVERSE exclusive running min along the candidate axis: out[i] =
    min(x[i+1..c-1]), +inf at i = c-1. Mirror of _running_max_excl."""
    c = x.shape[0]
    pinf = jnp.float32(jnp.inf)
    y = jnp.where(cand_idx <= c - 2, _roll(x, -1), pinf)
    d = 1
    while d < c:
        y = jnp.minimum(
            y, jnp.where(cand_idx <= c - 2 - d, _roll(y, -d), pinf)
        )
        d *= 2
    return y


def _bitonic_sort(key, payloads, c: int, ascending: bool = True):
    """Per-lane bitonic sort of (c, R) arrays along the candidate axis,
    carrying a tuple of payload arrays (any dtype — payloads are only
    rolled + selected, never compared). XOR-partner exchanges are expressed
    as two sublane rolls + selects (no per-lane addressing exists on TPU)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    n_lv = c.bit_length() - 1
    payloads = tuple(payloads)
    for k in range(1, n_lv + 1):
        desc = (idx & (1 << k)) != 0  # (c, 1) merge direction
        if not ascending:
            desc = ~desc
        for j in reversed(range(k)):
            d = 1 << j
            hi = (idx & d) != 0
            pk = jnp.where(hi, _roll(key, d), _roll(key, -d))
            rolled = tuple(
                jnp.where(hi, _roll(p, d), _roll(p, -d)) for p in payloads
            )
            keep_min = hi == desc
            take = (pk < key) == keep_min
            key = jnp.where(take, pk, key)
            payloads = tuple(
                jnp.where(take, rp, p) for rp, p in zip(rolled, payloads)
            )
    return key, payloads


def _bitonic_merge(key, payloads, n: int):
    """Ascending merge of a BITONIC (n, R) sequence (e.g. an ascending
    half concatenated with a descending half): the final level of the
    bitonic network alone — log2(n) exchange stages instead of a full
    sort's log^2."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    payloads = tuple(payloads)
    for j in reversed(range(n.bit_length() - 1)):
        d = 1 << j
        hi = (idx & d) != 0
        pk = jnp.where(hi, _roll(key, d), _roll(key, -d))
        rolled = tuple(
            jnp.where(hi, _roll(p, d), _roll(p, -d)) for p in payloads
        )
        take = (pk < key) == ~hi  # keep min in the low partner
        key = jnp.where(take, pk, key)
        payloads = tuple(
            jnp.where(take, rp, p) for rp, p in zip(rolled, payloads)
        )
    return key, payloads


def _running_max_excl_i32(x: jnp.ndarray, cand_idx: jnp.ndarray) -> jnp.ndarray:
    """Exclusive running max along the candidate axis for int32 (identity
    INT32_MIN); same Hillis-Steele doubling as _running_max_excl."""
    c = x.shape[0]
    nmin = jnp.iinfo(jnp.int32).min
    y = jnp.where(cand_idx >= 1, _roll(x, 1), nmin)
    d = 1
    while d < c:
        y = jnp.maximum(y, jnp.where(cand_idx >= d + 1, _roll(y, d), nmin))
        d *= 2
    return y


def _march_kernel(
    starts_ref,  # scalar prefetch: (T+1,) int32 pair-segment starts
    eye_ref,  # scalar prefetch: (3,) float32 camera eye (shared-origin mode)
    blocks_ref,  # scalar prefetch: block-mode chunk->block ids ((1,) dummy else)
    chunk_base_ref,  # scalar prefetch: (T+1,) int32 global chunk index of each
    #   tile's first chunk (save_tin mode; (1,) dummy otherwise)
    feats_hbm,  # (P_pad, F) float32 per-pair features, HBM-resident
    dirs_ref,  # (1, 8, R) float32: rows 0..2 = dir xyz, 3 = t_lo, 4 = t_hi,
    #            5 = carry-in transmittance (segment chaining)
    *rest,  # [orig_ref (1, 8, R): rows 0..2 origin xyz, if per_ray_origin]
    #         out_ref, [tin_hbm (chunk_cap, R) if save_tin],
    #         acc scratch, fbuf scratch, sems, [tin_sem if save_tin]
    config: RenderConfig,
    c: int,
    R: int,
    per_ray_origin: bool,
    block_mode: bool,
    save_tin: bool,
    quad: bool,
    packed16: bool = False,
    full_range: bool = False,
    block_sub: int = 1,
):
    rest = list(rest)
    orig_ref = rest.pop(0) if per_ray_origin else None
    out_ref = rest.pop(0)
    tin_hbm = rest.pop(0) if save_tin else None
    merge = config.order == "merge"
    acc = rest.pop(0)
    fbuf = rest.pop(0)
    sems = rest.pop(0)
    tin_sem = rest.pop(0) if save_tin else None
    pend_k, pend_a, pend_c = rest if merge else (None, None, None)
    t = pl.program_id(0)
    start = starts_ref[t]
    n = starts_ref[t + 1] - start
    n_chunks = pl.cdiv(n, c)
    f32 = jnp.float32

    dirs = dirs_ref[0]  # (8, R)
    dx, dy, dz = dirs[0:1, :], dirs[1:2, :], dirs[2:3, :]  # (1, R)
    t_lo, t_hi = dirs[3:4, :], dirs[4:5, :]  # (1, R) per-ray segment window
    live = dx * dx + dy * dy + dz * dz > 0.01  # |dir| > 0.1 (tracer.cu:59)
    ex, ey, ez = eye_ref[0], eye_ref[1], eye_ref[2]

    acc[0:3, :] = jnp.zeros((3, R), f32)
    acc[3:4, :] = dirs[5:6, :]  # carry-in transmittance
    acc[4:8, :] = jnp.zeros((4, R), f32)  # row 4: sort-fire counter

    # strictly-lower-triangular ones: exclusive prefix sums over candidates
    # (bf16: the mask is exact in bf16 and _tri_dot runs it on the fast MXU)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.bfloat16)
    cand_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    sh_deg = config.sh_degree
    K = num_coeffs(sh_deg)
    # list of K (1, R) arrays: layout-free per-ray basis values
    basis = sh_basis_list(dx, dy, dz, sh_deg) if sh_deg > 0 else None
    # MXU SH pays only when a sort network keeps the VPU saturated (the MXU
    # idles there): +3.1 ms in window order, -2.7 ms in key order (PERF.md
    # round-3 kernel matrix)
    sh_mxu = config.sh_mxu and sh_deg > 0 and config.order in ("window", "merge")
    if sh_mxu:
        # per-tile SH basis panel for the MXU radiance path: hi/lo bf16
        # split keeps ~18 mantissa bits through the bf16 MXU (the dropped
        # lo@lo term is ~2^-18 relative)
        bmat = jnp.concatenate(basis, axis=0)  # (K, R)
        bm_hi = bmat.astype(jnp.bfloat16)
        bm_lo = (bmat - bm_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    minT = config.min_transmittance

    def _composite_with(t_carry, a_ord, colors_ord):
        """Front-to-back composite of (already correctly ordered) alphas:
        exclusive prefix product, early-termination freeze
        (shaders/tracer.cuh:341), per-channel radiance. Returns
        (rgb_part (3, R), t_next (1, R)).

        Two prefix-product forms (config.composite_scan, A/B'd on chip):
        the VPU doubling scan (_prefix_prod_excl, log2(c) roll/mul steps,
        no transcendentals) or the original exp(L @ log1p) bf16-split MXU
        contraction (ops/composite.py equivalence). The training forward
        (save_tin) always keeps the MXU form: the hand-written backward
        recomputes through tri_dot and must see its exact rounding."""
        if config.composite_scan and not save_tin:
            one_m = 1.0 - a_ord
            p_excl = t_carry * _prefix_prod_excl(one_m, cand_idx)
            p_incl = p_excl * one_m
            w = a_ord * p_excl * (p_excl > minT)
            below = p_incl <= minT
            frozen = jnp.max(
                jnp.where(below, p_incl, -jnp.inf), axis=0, keepdims=True
            )
            # full-chunk product = the last INCLUSIVE prefix (sublane slice)
            p_last = p_incl[c - 1 : c, :]
            t_next = jnp.where(
                jnp.any(below, axis=0, keepdims=True), frozen, p_last
            )
        else:
            logp = jnp.log1p(-a_ord)
            s_excl = _tri_dot(tri, logp)  # (c, R)
            p_excl = t_carry * jnp.exp(s_excl)
            p_incl = p_excl * (1.0 - a_ord)
            w = a_ord * p_excl * (p_excl > minT)

            # sequential early-termination semantics (ops/composite.py):
            # the first candidate (in composite order) driving p below
            # minT freezes the carry — that p is the MAX of the below set
            below = p_incl <= minT
            frozen = jnp.max(
                jnp.where(below, p_incl, -jnp.inf), axis=0, keepdims=True
            )
            p_last = t_carry * jnp.exp(
                jnp.sum(logp, axis=0, keepdims=True)
            )  # full-chunk product: order-free
            t_next = jnp.where(
                jnp.any(below, axis=0, keepdims=True), frozen, p_last
            )

        # weighted radiance: VPU broadcast-multiply + sublane reduction per
        # channel ((c, 1) columns broadcast over lanes for free). An MXU
        # (3, c) @ (c, R) dot_general was tried for the (c, 1) case and is
        # 3.4 ms SLOWER at the bench scale: f32 MXU runs at 1/8 rate and
        # M=3 uses 3/128 of the array (PERF.md round-3 kernel matrix,
        # sh0 6.22 ms vs sh3 2.85 ms was this op).
        rgb_part = jnp.concatenate(
            [
                jnp.sum(w * colors_ord[ch], axis=0, keepdims=True)
                for ch in range(3)
            ],
            axis=0,
        )
        return rgb_part, t_next

    def _pack_colors(colors, Rg=R):
        """3 x (c, 1)|(c, Rg) colors in [0, 4) -> (c, Rg) int32, 3x10 bits
        (1/256 steps; output is RGB8-quantized anyway, tracer.cuh:484)."""
        q = lambda x: jnp.clip(x * 255.75, 0.0, 1023.0).astype(jnp.int32)
        cp = (
            jax.lax.shift_left(q(colors[0]), 20)
            | jax.lax.shift_left(q(colors[1]), 10)
            | q(colors[2])
        )
        return jnp.broadcast_to(cp, (c, Rg))

    def _unpack_colors(cp):
        unq = lambda x: x.astype(f32) * (1.0 / 255.75)
        mask10 = jnp.int32(1023)
        return [
            unq(jax.lax.shift_right_logical(cp, 20) & mask10),
            unq(jax.lax.shift_right_logical(cp, 10) & mask10),
            unq(cp & mask10),
        ]

    if merge:
        # pending buffer: the deferred (largest-key) half of the running
        # cross-chunk merge, per tile. Empty slots carry INT32_MIN so they
        # sort FIRST and are drained through the (zero-alpha-harmless)
        # ready half — with INT32_MAX empties the first merging step would
        # composite the whole real chunk and keep the pipeline empty,
        # collapsing the scheme to plain window/c ordering. Real keys are
        # bitcasts of nonnegative floats (>= 0 > INT32_MIN), so empties
        # never collide with candidates.
        pend_k[...] = jnp.full((c, R), jnp.iinfo(jnp.int32).min, jnp.int32)
        pend_a[...] = jnp.zeros((c, R), f32)
        pend_c[...] = jnp.zeros((c, R), jnp.int32)

    if quad:
        # per-tile (1, R) direction monomials for the quadratic-form
        # response: with Q = M^T M, dd = d^T Q d = q . m2(d) and
        # od = (eye-mu)^T Q d = v . d, evaluated as (c, 1) x (1, R)
        # broadcast products on the VPU. MXU (c, 8) @ (8, R) matmuls were
        # tried first and are NUMERICALLY BROKEN here: Mosaic lowers them
        # at bf16 input precision, and od sums terms of magnitude
        # |Q||rel||d| (~1e6 for small-scale gaussians) that cancel to
        # O(1e3) — the ~2^-9-relative operand rounding destroys the
        # response entirely (PSNR ~11 dB vs the tiled path on chip, round
        # 3). The VPU broadcast form is full f32 and costs ~16 ops.
        m2 = (dx * dx, dy * dy, dz * dz,
              2.0 * dx * dy, 2.0 * dx * dz, 2.0 * dy * dz)  # (1, R) each
        if per_ray_origin:
            # PER-RAY-ORIGIN quad response (bounced segments / rolling
            # shutter): the shared-origin columns v = Q(eye - mu), cq, oo
            # are eye-relative and unusable, but Q = M^T M itself is
            # view-independent — expand around the TILE'S ORIGIN CENTROID
            # o_bar so every f32 product stays small (expanding around the
            # world origin would run |Q| |o|^2 ~ 1e5-1e6 terms through a
            # cancellation to O(10) — the same class of blow-up that
            # killed the bf16 MXU path, PERF.md round 3). With
            # a = o - o_bar (per ray, (1, R)) and b = mu - o_bar (per
            # candidate, (c, 1)):
            #   od = (o - mu)^T Q d       = q . od6(a, d) - (Q b) . d
            #   oo = (o - mu)^T Q (o - mu) = q . oo6(a) - 2 (Q b) . a
            #                                + b^T Q b
            # where Q b and b^T Q b are (c, 1) column math (cheap) and
            # od6/oo6 are per-tile (1, R) monomials — the whole response
            # stays (c, 1) x (1, R) broadcast products, ~40% fewer (c, R)
            # ops than the canonical-frame transform path (the round-4
            # stage attribution's named lever for the glass bounce).
            orow_q = orig_ref[0]
            oxr, oyr, ozr = orow_q[0:1, :], orow_q[1:2, :], orow_q[2:3, :]
            obx, oby, obz = jnp.mean(oxr), jnp.mean(oyr), jnp.mean(ozr)
            axr, ayr, azr = oxr - obx, oyr - oby, ozr - obz  # (1, R)
            od6 = (axr * dx, ayr * dy, azr * dz,
                   axr * dy + ayr * dx, axr * dz + azr * dx,
                   ayr * dz + azr * dy)
            oo6 = (axr * axr, ayr * ayr, azr * azr,
                   2.0 * axr * ayr, 2.0 * axr * azr, 2.0 * ayr * azr)

    def get_dmas(slot, j):
        """The chunk's async feature copies (a list: block mode may stream
        block_sub morton blocks into one chunk buffer — halving the chunk
        count halves the march's per-chunk fixed costs, which dominate the
        candidate-bound bounce march)."""
        if block_mode and block_sub > 1:
            bs = c // block_sub
            copies = []
            for s in range(block_sub):
                ofs = blocks_ref[start // bs + j * block_sub + s] * bs
                copies.append(pltpu.make_async_copy(
                    feats_hbm.at[pl.ds(ofs, bs), :],
                    fbuf.at[slot, pl.ds(s * bs, bs), :],
                    sems.at[slot],
                ))
            return copies
        if block_mode:
            # chunk == block: the feature rows of chunk j live at the morton
            # block's own contiguous range (ops/blocks.py) — no per-pair
            # feature stream is ever materialized for bounced rays
            ofs = blocks_ref[start // c + j] * c
        else:
            ofs = start + j * c
        if packed16:
            # int16 rows tile at 16 sublanes: Mosaic requires provably
            # aligned dynamic row offsets, so fetch from the aligned base
            # and rotate the decoded panel by the residue in-kernel
            ofs = (ofs // 16) * 16
            rows = c + 16
        else:
            rows = c
        return [pltpu.make_async_copy(
            feats_hbm.at[pl.ds(ofs, rows), :],
            fbuf.at[slot],
            sems.at[slot],
        )]

    @pl.when(n_chunks > 0)
    def _():
        for cp in get_dmas(0, 0):
            cp.start()

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_chunks)
        def _():
            for cp in get_dmas((j + 1) % 2, j + 1):
                cp.start()

        for cp in get_dmas(slot, j):
            cp.wait()
        t_carry = acc[3:4, :]  # (1, R)

        if save_tin:
            # carry-in transmittance of every chunk, for the hand-written
            # backward sweep (unique slot per (tile, chunk): chunk_base is
            # the exclusive cumsum of per-tile chunk counts). The whole
            # 8-row acc panel is stored: Mosaic DMA slices must be
            # sublane-tile (8) aligned, single rows are not.
            tin_dma = pltpu.make_async_copy(
                acc,
                tin_hbm.at[chunk_base_ref[t] + j],
                tin_sem,
            )
            tin_dma.start()
            tin_dma.wait()

        # chunk-level early exit: the whole chunk's compute is skipped once
        # every ray's transmittance is at or below the skip threshold. At
        # the default (== min_transmittance) this is exactly the reference's
        # per-ray stop (tracer.cuh:341) lifted to the tile; raising it
        # (config.chunk_skip_transmittance) trades a bounded error — each
        # ray's remaining contribution is <= its current T <= threshold per
        # channel — for skipping the tile's tail chunks sooner. Training
        # (save_tin) always uses min_transmittance: the backward's skip
        # decision replays the forward's from the saved carries.
        t_skip = (
            config.min_transmittance
            if save_tin
            else max(config.chunk_skip_transmittance, config.min_transmittance)
        )

        @pl.when(jnp.max(t_carry) > t_skip)
        def _():
            g = fbuf[slot]  # (c, F)
            if packed16:
                # int16 bit-split rows (models/tiled.feature_table_packed16):
                # lanes 0..63 carry f32 bits 31..16, lanes 64..127 bits
                # 15..0 — exact f32 reassembly, half the HBM bytes. The DMA
                # fetched c + 16 rows from the 16-aligned base; rotate the
                # decoded panel so row 0 is the segment's true chunk start.
                hi = g[:, 0:64].astype(jnp.int32)
                lo = g[:, 64:128].astype(jnp.int32)
                gfull = jax.lax.bitcast_convert_type(
                    jax.lax.shift_left(hi, 16) | (lo & jnp.int32(0xFFFF)),
                    jnp.float32,
                )  # (c + 16, 64)
                delta = (start + j * c) % 16
                g = pltpu.roll(gfull, (c + 16) - delta, axis=0)[:c, :]
                iOP, iQ0, iV0 = _P16_OP, _P16_Q0, _P16_V0
                iCQ, iOO, iSH0, iRGB0 = _P16_CQ, _P16_OO, _P16_SH0, _P16_SH0
            else:
                iOP, iQ0, iV0 = _OP, _Q0, _V0
                iCQ, iOO, iSH0, iRGB0 = _CQ, _OO, _SH0, _RGB0
            col = lambda k: g[:, k : k + 1]  # (c, 1)
            op = col(iOP)

            present = cand_idx < (n - j * c)  # (c, 1) tail mask
            if quad:
                # quadratic-form response, f32 VPU broadcasts:
                # dd = d^T Q d = sum_k q_k * m2_k(d); shared origin reads
                # the precomputed od = v . d and cq/oo columns, per-ray
                # origins evaluate the tile-centered expansion (see the
                # od6/oo6 comment above)
                q = [col(iQ0 + k) for k in range(6)]  # (c, 1) each
                dd = (q[0] * m2[0] + q[1] * m2[1] + q[2] * m2[2]
                      + q[3] * m2[3] + q[4] * m2[4] + q[5] * m2[5])  # (c, R)
                if per_ray_origin:
                    bx = col(_MX) - obx  # (c, 1) b = mu - o_bar
                    by = col(_MY) - oby
                    bz = col(_MZ) - obz
                    vx = q[0] * bx + q[3] * by + q[4] * bz  # (c, 1) Q b
                    vy = q[3] * bx + q[1] * by + q[5] * bz
                    vz = q[4] * bx + q[5] * by + q[2] * bz
                    mqm = vx * bx + vy * by + vz * bz  # (c, 1) b^T Q b
                    od = (q[0] * od6[0] + q[1] * od6[1] + q[2] * od6[2]
                          + q[3] * od6[3] + q[4] * od6[4] + q[5] * od6[5]
                          - (vx * dx + vy * dy + vz * dz))  # (c, R)
                    oo_b = (q[0] * oo6[0] + q[1] * oo6[1] + q[2] * oo6[2]
                            + q[3] * oo6[3] + q[4] * oo6[4] + q[5] * oo6[5]
                            - 2.0 * (vx * axr + vy * ayr + vz * azr)
                            + mqm)  # (c, R)
                    rad_q = col(_RAD)
                    cq = oo_b - rad_q * rad_q
                else:
                    od = (col(iV0) * dx + col(iV0 + 1) * dy
                          + col(iV0 + 2) * dz)  # (c, R)
                    cq = col(iCQ)
                    oo_b = col(iOO)
                rcp6 = 1.0 / jnp.maximum(dd, 1e-6)
                t_star = -od * rcp6
                pp = oo_b + od * t_star  # oo - od^2/dd
                resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
                alpha = jnp.minimum(config.alpha_clamp, resp * op)
                # sqrt/div-free event math when the ordering key doesn't
                # need the entry t: the ray's [t_lo, inf) window intersects
                # the iso ellipsoid iff the convex quadratic q(t) =
                # |o_g + t d_g|^2 - rad^2 is negative at max(t_lo, t*) —
                # i.e. (t* >= t_lo and alpha > alpha_min) or q(t_lo) < 0.
                # Exact vs the oracle's entry/exit rule whenever no
                # ellipsoid reaches past t_hi = t_max = 1e5 (full-range
                # primary marches only; scene extents are ~10).
                fast_gate = full_range and (
                    config.order == "key" or config.window_key == "peak"
                )
                if fast_gate:
                    q_lo = cq + t_lo * (2.0 * od + t_lo * dd)
                    gate = (
                        present & live & (alpha > config.alpha_min)
                        & ((t_star >= t_lo) | (q_lo < 0.0))
                    )
                    t_event = t_star  # ordering key (window_key == "peak")
                else:
                    disc = od * od - dd * cq
                    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                    inv_dd = 1.0 / jnp.maximum(dd, 1e-12)
                    t_entry = (-od - sq) * inv_dd
                    t_exit = (-od + sq) * inv_dd
                    t_event = jnp.where(t_entry < t_lo, t_exit, t_entry)
                    in_window = (t_event >= t_lo) & (t_event <= t_hi)
                    # disc >= 0 is implied by alpha > alpha_min (the
                    # adaptive radius is the alpha_min iso-surface:
                    # resp*op > alpha_min <=> pp < rad^2 <=> disc > 0),
                    # so the gate drops it
                    gate = (
                        present & in_window & live
                        & (alpha > config.alpha_min)
                    )
            else:
                rad = col(_RAD)

                # canonical frame: o_g = M (origin - mu), d_g = M d
                m = [col(_M0 + k) for k in range(9)]
                if per_ray_origin:
                    orow = orig_ref[0]  # (8, R)
                    ox = orow[0:1, :] - col(_MX)  # (c, R)
                    oy = orow[1:2, :] - col(_MY)
                    oz = orow[2:3, :] - col(_MZ)
                else:
                    ox = ex - col(_MX)  # (c, 1): rays share the eye
                    oy = ey - col(_MY)
                    oz = ez - col(_MZ)
                ogx = m[0] * ox + m[1] * oy + m[2] * oz  # (c, 1) or (c, R)
                ogy = m[3] * ox + m[4] * oy + m[5] * oz
                ogz = m[6] * ox + m[7] * oy + m[8] * oz
                dgx = m[0] * dx + m[1] * dy + m[2] * dz  # (c, R)
                dgy = m[3] * dx + m[4] * dy + m[5] * dz
                dgz = m[6] * dx + m[7] * dy + m[8] * dz

                dd = dgx * dgx + dgy * dgy + dgz * dgz
                od = ogx * dgx + ogy * dgy + ogz * dgz
                oo = ogx * ogx + ogy * ogy + ogz * ogz  # (c, 1) or (c, R)

                # max response along the ray (shaders/tracer.cuh:187-214)
                t_star = -od / jnp.maximum(dd, 1e-6)
                pp = oo + t_star * (2.0 * od + t_star * dd)
                resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
                alpha = jnp.minimum(config.alpha_clamp, resp * op)

                # iso-ellipsoid event within [t_min, t_max] (oracle hit rule)
                cq = oo - rad * rad
                disc = od * od - dd * cq
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                inv_dd = 1.0 / jnp.maximum(dd, 1e-12)
                t_entry = (-od - sq) * inv_dd
                t_exit = (-od + sq) * inv_dd
                t_event = jnp.where(t_entry < t_lo, t_exit, t_entry)
                in_window = (t_event >= t_lo) & (t_event <= t_hi)

                gate = (
                    present
                    & (disc >= 0.0)
                    & in_window
                    & live
                    & (alpha > config.alpha_min)
                )
            if config.hit_multiplicity == 1:
                a_eff = alpha
            else:
                a_eff = 1.0 - (1.0 - alpha) ** config.hit_multiplicity
            a = jnp.where(gate, a_eff, 0.0)

            # per-candidate colors (needed before a possible per-ray re-sort)
            colors = []
            if sh_mxu:
                # per-channel (c, K) @ (K, R) MXU contractions (hi/lo bf16:
                # ~4e-6 relative of the VPU loop; a stacked (3c, K) concat
                # is rejected by Mosaic — lane-offset mismatch)
                for ch in range(3):
                    coef = g[:, iSH0 + ch * K : iSH0 + (ch + 1) * K]  # (c, K)
                    co_hi = coef.astype(jnp.bfloat16)
                    co_lo = (coef - co_hi.astype(f32)).astype(jnp.bfloat16)
                    raw = (
                        jnp.dot(co_hi, bm_hi, preferred_element_type=f32)
                        + jnp.dot(co_hi, bm_lo, preferred_element_type=f32)
                        + jnp.dot(co_lo, bm_hi, preferred_element_type=f32)
                    ) + 0.5  # (c, R)
                    colors.append(jnp.maximum(raw, 0.0))
            else:
                for ch in range(3):
                    if sh_deg == 0:
                        if quad:
                            colors.append(col(iRGB0 + ch))  # precomputed, clamped
                        else:
                            colors.append(
                                jnp.maximum(0.5 + SH_C0 * col(iSH0 + ch * K), 0.0)
                            )  # (c, 1)
                    else:
                        acc_c = jnp.full((c, R), 0.5, f32)
                        for k in range(K):
                            acc_c += basis[k] * col(iSH0 + ch * K + k)
                        colors.append(jnp.maximum(acc_c, 0.0))  # (c, R)

            _composite = functools.partial(_composite_with, t_carry)
            # per-ray ordering key (config.window_key): the oracle's event
            # t, or the peak-response t* (no extra math — t* is already
            # computed for the response)
            t_key = t_star if config.window_key == "peak" else t_event

            if merge:
                # ---- cross-chunk streaming merge (parity-grade ordering
                # at half the window-sort width): keep the c largest-key
                # candidates seen so far PENDING; each chunk is sorted
                # descending, bitonic-merged with the pending buffer, and
                # only the smallest c of the union are composited now.
                # Inversions up to ~2 chunks wide are repaired exactly
                # (vs ~1 chunk for order="window" at the same c).
                # Key: bitcast of the (nonnegative) order t with the low 8
                # mantissa bits replaced by the source index — globally
                # comparable across chunks (unlike the window sort's
                # per-chunk quantization) and unique within a chunk so the
                # networks are true permutations. Zero-alpha candidates
                # inherit their significant predecessor's key (running
                # max), so "chunk already ordered" reduces to the
                # significant subsequence being ordered.
                kb = jax.lax.bitcast_convert_type(
                    jnp.maximum(t_key, 0.0), jnp.int32
                ) & jnp.int32(~0xFF)
                src = jax.lax.broadcasted_iota(jnp.int32, (c, R), 0)
                imin = jnp.iinfo(jnp.int32).min
                gated = jnp.where(a > 0.0, kb, imin)
                rmax = _running_max_excl_i32(gated, cand_idx)
                ikey = jnp.where(a > 0.0, kb, rmax) | src
                has_inv = jnp.any((a > 0.0) & (kb < rmax))
                pk0 = pend_k[...]
                pa0 = pend_a[...]
                pc0 = pend_c[...]
                # chunk-vs-pending order: compare significant keys only
                new_min = jnp.min(
                    jnp.where(a > 0.0, kb, jnp.iinfo(jnp.int32).max),
                    axis=0, keepdims=True,
                )
                pend_max = jnp.max(
                    jnp.where(pa0 > 0.0, pk0, imin), axis=0, keepdims=True
                )
                fast_ok = (~has_inv) & jnp.all(new_min >= pend_max)

                cpack = _pack_colors(colors)
                a_bc = jnp.broadcast_to(a, (c, R))

                def _fast(k_n, a_n, c_n, pk, pa, pc):
                    # new chunk is ordered and entirely behind the pending
                    # buffer: pending is ready as-is, chunk becomes pending
                    return (pk, pa, pc), (k_n, a_n, c_n)

                def _slow(k_n, a_n, c_n, pk, pa, pc):
                    kd, (ad, cd) = _bitonic_sort(
                        k_n, (a_n, c_n), c, ascending=False
                    )
                    mk = jnp.concatenate([pk, kd], axis=0)
                    ma = jnp.concatenate([pa, ad], axis=0)
                    mc2 = jnp.concatenate([pc, cd], axis=0)
                    mk, (ma, mc2) = _bitonic_merge(mk, (ma, mc2), 2 * c)
                    return (
                        (mk[:c], ma[:c], mc2[:c]),
                        (mk[c:], ma[c:], mc2[c:]),
                    )

                ready, newpend = jax.lax.cond(
                    fast_ok, _fast, _slow, ikey, a_bc, cpack, pk0, pa0, pc0
                )
                pend_k[...], pend_a[...], pend_c[...] = newpend
                rgb_part, t_next = _composite(
                    ready[1], _unpack_colors(ready[2])
                )
            elif config.order == "window":
                # Bounded-window exact ordering (tracer.cu:124-153 k-buffer
                # semantics at window width c): per-ray bitonic sort of the
                # chunk by exact event t — SKIPPED when the significant
                # (a > 0) subsequence is already nondecreasing in t. The
                # test is an exclusive running max over significance-gated
                # t (log2(c) masked rolls): exact on subsequences, unlike
                # an adjacent-pair test, which both misses inversions
                # straddling gated-out candidates and fires spuriously when
                # any gated-out candidate precedes a real hit.
                #
                # The chunk's lanes run in independent 128-lane GROUPS (the
                # VPU register width): a (c, R) op costs exactly R/128x the
                # (c, 128) op, so the split is free when no group fires, and
                # an inversion confined to one half of the tile pays a
                # half-width network instead of the full (c, R) one (the
                # per-ray sort is per-lane, so group boundaries cannot
                # change any ray's result). Mosaic legality (the round-3
                # bench regression): every per-group operand must be either
                # a (c, R) register value vreg-column-sliced to (c, gw), a
                # fresh VMEM load, or a scalar — NEVER a register slice of
                # a (1, R) value, whose lane-offset layout cannot legally
                # broadcast to (c, gw) ("Invalid input layout"
                # vector.broadcast (1,128)->(128,128), BENCH_r03). The
                # carry therefore reloads per group from the acc ref, and
                # results store straight to per-group acc lane slices (no
                # cross-group concatenate). Render-only: the training
                # forward (save_tin) keeps the whole-chunk branch so the
                # hand-written backward replays its sort decisions
                # bit-exactly.
                n_groups = (
                    R // 128
                    if (config.sort_lane_groups and not save_tin
                        and R % 128 == 0 and R > 128)
                    else 1
                )
                gw = R // n_groups

                # span-bounded repair (config.sort_repair = w > 0,
                # render-only): inversions in the depth-presorted stream
                # come from individual displaced gaussians, so the
                # out-of-place elements usually live in a NARROW contiguous
                # index band [i0, i1] of the chunk. Sorting ANY contiguous
                # window containing that band yields the correct
                # significant order (elements before i0 are <= the
                # suffix min that follows them; elements after i1 are >=
                # the running max before them — both proved by the very
                # tests that define i0/i1), and a (w, R) network costs
                # ~(w log^2 w)/(c log^2 c) of the full one. i1 = last
                # index below its exclusive running max (the fire test's
                # own violation mask); i0 = first index above its REVERSE
                # exclusive running min. The window start clamps to
                # c - w so the sublane slice never wraps. Fall back to the
                # full network when the band is wider than w.
                repair_w = (
                    config.sort_repair
                    if (not save_tin and 0 < config.sort_repair < c)
                    else 0
                )

                def _sorted_branch(a_, t_event_, rmax_g, colors_g, tc_g):
                    # pack (paid only when the network runs). Two variants:
                    #
                    # Training (save_tin): the key is UNIQUE per lane —
                    # (t quantized to 16 bits within the chunk's range)
                    # << 8 | source candidate index. Uniqueness makes the
                    # network a true permutation (on key ties the
                    # XOR-exchange duplicates one payload and drops its
                    # partner, which both corrupts colors and breaks the
                    # backward's permutation inverse), and the embedded
                    # source index is how the backward kernel inverts the
                    # sort. Alpha rides as an EXACT float payload.
                    #
                    # Render-only (not save_tin): alpha rides IN the key
                    # (15-bit quantization, <= 1.5e-5 absolute error) so the
                    # sort carries ONE payload (the packed colors) instead
                    # of two — ~1/3 fewer VPU ops in the network that
                    # dominates the window kernel (PERF.md round-3 matrix).
                    # Key = tq16 << 15 | a15 (65535 << 15 < 2^31). Exact
                    # key ties can duplicate a color pack between the two
                    # tied lanes — bounded by the color difference of
                    # same-t same-alpha candidates, invisible at RGB8.
                    gated_t = jnp.where(a_ > 0.0, t_event_, jnp.inf)
                    t_min_c = jnp.min(gated_t)
                    t_max_c = jnp.max(jnp.where(a_ > 0.0, t_event_, -jnp.inf))
                    t_rng = jnp.maximum(t_max_c - t_min_c, 1e-20)
                    tq = jnp.clip(
                        (t_event_ - t_min_c) * (65534.0 / t_rng), 0.0, 65534.0
                    ).astype(jnp.int32)
                    cpack = _pack_colors(colors_g, gw)
                    if save_tin:
                        src = jax.lax.broadcasted_iota(jnp.int32, (c, gw), 0)
                        zbase = jnp.int32(65535 << 8)
                        skey = jnp.where(
                            a_ > 0.0, jax.lax.shift_left(tq, 8), zbase
                        ) | src
                        apay = jnp.broadcast_to(a_, (c, gw))
                        _, (cpack_s, a_s) = _bitonic_sort(
                            skey, (cpack, apay), c
                        )
                    else:
                        aq = jnp.clip(a_ * 32767.0, 0.0, 32767.0).astype(
                            jnp.int32
                        )
                        zbase = jnp.int32(65535 << 15)
                        skey = jnp.where(
                            a_ > 0.0,
                            jax.lax.shift_left(tq, 15) | aq,
                            zbase,
                        )
                        skey = jnp.broadcast_to(skey, (c, gw))

                        def _full(sk, cp):
                            ks, (cs,) = _bitonic_sort(sk, (cp,), c)
                            return ks, cs

                        rep = jnp.float32(0.0)
                        if repair_w:
                            w = repair_w
                            idx2 = jax.lax.broadcasted_iota(
                                jnp.int32, (c, gw), 0
                            )
                            viol = (a_ > 0.0) & (t_event_ < rmax_g)
                            i1 = jnp.max(jnp.where(viol, idx2, -1))
                            smin = _running_min_excl_rev(
                                jnp.where(a_ > 0.0, t_event_, jnp.inf),
                                cand_idx,
                            )
                            viol0 = (a_ > 0.0) & (t_event_ > smin)
                            i0 = jnp.min(jnp.where(viol0, idx2, c))
                            ws = jnp.minimum(i0, c - w)
                            repair_ok = (i1 - i0) < w
                            rep = jnp.where(repair_ok, 1.0, 0.0)

                            def _repair(sk, cp):
                                skr = _roll(sk, -ws)
                                cpr = _roll(cp, -ws)
                                k64, (c64,) = _bitonic_sort(
                                    skr[:w], (cpr[:w],), w
                                )
                                k2 = jnp.concatenate(
                                    [k64, skr[w:]], axis=0
                                )
                                c2 = jnp.concatenate(
                                    [c64, cpr[w:]], axis=0
                                )
                                return _roll(k2, ws), _roll(c2, ws)

                            skey_s, cpack_s = jax.lax.cond(
                                repair_ok, _repair, _full, skey, cpack
                            )
                        else:
                            skey_s, cpack_s = _full(skey, cpack)
                        a_s = jnp.where(
                            skey_s >= zbase,
                            0.0,
                            (skey_s & 32767).astype(f32) * (1.0 / 32767.0),
                        )
                        rgb_p, t_n_ = _composite_with(
                            tc_g, a_s, _unpack_colors(cpack_s)
                        )
                        return rgb_p, t_n_, jnp.broadcast_to(
                            rep, (1, gw)
                        )
                    rgb_p, t_n_ = _composite_with(
                        tc_g, a_s, _unpack_colors(cpack_s)
                    )
                    return rgb_p, t_n_, jnp.zeros((1, gw), f32)

                for gi in range(n_groups):
                    gs = slice(gi * gw, (gi + 1) * gw)
                    a_g = a if n_groups == 1 else a[:, gs]
                    t_g = t_key if n_groups == 1 else t_key[:, gs]
                    colors_g = [
                        ci if (n_groups == 1 or ci.shape[1] == 1)
                        else ci[:, gs]
                        for ci in colors
                    ]
                    tc_g = acc[3:4, gs]  # fresh VMEM load (see above)
                    # (A bf16 fire test — half the vregs in this doubling
                    # scan — is NOT implementable: Mosaic's tpu.dynamic_rotate
                    # rejects non-32-bit data, and the scan is rolls.)
                    # Weight-aware firing (config.sort_alpha_min > 0,
                    # render-only): inversions confined to near-transparent
                    # candidates are ignored — swapping candidates i < j
                    # changes the image by at most a_i * a_j * T per
                    # channel, so a chunk whose only inversions involve
                    # alpha <= sort_alpha_min composites in stream order
                    # with bounded error instead of paying the network.
                    # When the sort DOES fire it still orders everything.
                    a_fire = (
                        config.sort_alpha_min
                        if (config.sort_alpha_min > 0.0 and not save_tin)
                        else 0.0
                    )
                    sig_t = jnp.where(a_g > a_fire, t_g, -jnp.inf)
                    rmax = _running_max_excl(sig_t, cand_idx)
                    has_inv = jnp.any((a_g > a_fire) & (t_g < rmax))
                    # sort-fire telemetry in the spare acc row (per lane
                    # group; surfaced by pallas_march_stream(stats=True))
                    acc[4:5, gs] = acc[4:5, gs] + jnp.where(
                        has_inv, 1.0, 0.0
                    )
                    def _nofire(a_, t_, rm_, tc=tc_g, cg=colors_g):
                        rgb_p, t_n_ = _composite_with(tc, a_, cg)
                        return rgb_p, t_n_, jnp.zeros((1, gw), f32)

                    rgb_g, t_n, rep_g = jax.lax.cond(
                        has_inv,
                        functools.partial(
                            _sorted_branch, colors_g=colors_g, tc_g=tc_g
                        ),
                        _nofire,
                        a_g, t_g, rmax,
                    )
                    # row 5: span-repair fire count (<= row 4's full-fire
                    # count; the difference is full-network fires)
                    acc[5:6, gs] = acc[5:6, gs] + rep_g
                    acc[3:4, gs] = jnp.where(tc_g > minT, t_n, tc_g)
                    acc[0:3, gs] = acc[0:3, gs] + rgb_g
            else:
                rgb_part, t_next = _composite(a, colors)

            if config.order != "window":
                acc[3:4, :] = jnp.where(t_carry > minT, t_next, t_carry)
                acc[0:3, :] = acc[0:3, :] + rgb_part

        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)

    if merge:
        # flush the pending buffer (ascending-sorted; empty slots carry
        # a = 0 and contribute nothing)
        t_carry = acc[3:4, :]
        rgb_part, t_next = _composite_with(
            t_carry, pend_a[...], _unpack_colors(pend_c[...])
        )
        acc[3:4, :] = jnp.where(t_carry > minT, t_next, t_carry)
        acc[0:3, :] = acc[0:3, :] + rgb_part

    out_ref[0] = acc[:]


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_tiles", "rays_per_tile", "chunk", "interpret", "save_tin", "quad", "stats", "packed16", "block_sub"),
)
def pallas_march_stream(
    starts: jnp.ndarray,  # (T+1,) int32
    eye: jnp.ndarray,  # (3,) float32
    pair_feats: jnp.ndarray,  # (P_pad, F) float32, P_pad >= starts[-1] + chunk
    dirs_t: jnp.ndarray,  # (T, R, 3) float32 tile ray dirs
    config: RenderConfig,
    n_tiles: int,
    rays_per_tile: int,
    chunk: int = 128,
    interpret: bool = False,
    origins_t: jnp.ndarray | None = None,  # (T, R, 3) per-ray origins
    t_lo: jnp.ndarray | None = None,  # (T, R) per-ray window, default t_min
    t_hi: jnp.ndarray | None = None,  # (T, R) per-ray window, default t_max
    t0: jnp.ndarray | None = None,  # (T, R) carry-in transmittance
    block_offsets: jnp.ndarray | None = None,  # (cap_b,) morton block ids:
    #   block mode (ops/blocks.py) — chunk j of tile t streams the feature
    #   rows of block block_offsets[starts[t]//chunk + j]; `pair_feats` is
    #   then the morton-SORTED feature table
    save_tin: bool = False,  # additionally return each chunk's carry-in
    #   transmittance (chunk_cap, R) + the chunk_base index (for the
    #   hand-written backward kernel)
    quad: bool = False,  # use the quadratic-form feature columns (MXU
    #   response path; requires a feature table built with eye= and a
    #   shared ray origin — see models/tiled.feature_table)
    stats: bool = False,  # additionally return the per-tile count of
    #   chunks whose window-sort network ran (telemetry row 4)
    packed16: bool = False,  # pair_feats is the int16 bit-split quad table
    #   (models/tiled.feature_table_packed16): half the gather/DMA bytes,
    #   exact f32 reassembly in-kernel; requires quad, render-only
    block_sub: int = 1,  # block mode only: morton blocks streamed per chunk
    #   (chunk = block_sub * block_size). Halving the chunk count halves
    #   the march's per-chunk fixed costs on the chunk-count-bound bounce
    #   path; the window/merge sort width grows with the chunk accordingly
):
    """March every tile over its pair-stream segment.

    With the optional per-ray arguments this also serves bounced-segment
    rendering (models/mesh_tracer.py): arbitrary per-ray origins, a per-ray
    [t_lo, t_hi] window (the reference marches [t_min, t_hit] up to the mesh
    hit, tracer.cu:84-99), and a carry-in transmittance for chaining
    segments across bounces (rayData.density, tracer.cuh:334).

    Returns (rgb (T, R, 3), t_final (T, R) transmittance carry-out).
    """
    R = rays_per_tile
    if not interpret and R % 128 != 0:
        raise ValueError(
            f"rays_per_tile={R} must be a multiple of 128 on TPU (Mosaic "
            "lane tiling); use tile_w*tile_h in {128, 256, ...} or the XLA "
            "tiled path"
        )
    F = pair_feats.shape[1]
    # (T, 8, R) packed per-ray rows: Mosaic block shapes need the last two
    # dims to be (8k, 128k), so per-tile vectors ride in 8-row panels.
    # Rows: 0..2 dir xyz, 3 t_lo, 4 t_hi, 5 carry-in transmittance.
    dirs_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
    dirs_pack = dirs_pack.at[:, 0:3, :].set(
        jnp.transpose(dirs_t, (0, 2, 1)).astype(jnp.float32)
    )
    dirs_pack = dirs_pack.at[:, 3, :].set(
        jnp.full((n_tiles, R), config.t_min, jnp.float32) if t_lo is None else t_lo
    )
    dirs_pack = dirs_pack.at[:, 4, :].set(
        jnp.full((n_tiles, R), config.t_max, jnp.float32) if t_hi is None else t_hi
    )
    dirs_pack = dirs_pack.at[:, 5, :].set(
        jnp.ones((n_tiles, R), jnp.float32) if t0 is None else t0
    )

    per_ray_origin = origins_t is not None
    block_mode = block_offsets is not None
    if block_sub > 1 and (not block_mode or chunk % block_sub or save_tin
                          or packed16):
        raise ValueError("block_sub > 1 is the render-only block-mode "
                         "multi-block chunk path (chunk % block_sub == 0)")
    blocks_arg = (
        # padded by block_sub so a tail chunk's extra block lookups stay
        # in bounds (their candidates are masked by the `present` tail
        # mask; the dummy block-0 DMA is harmless)
        jnp.concatenate(
            [block_offsets, jnp.zeros((block_sub,), block_offsets.dtype)]
        )
        if block_mode else jnp.zeros((1,), jnp.int32)
    )
    if save_tin:
        counts = jnp.diff(starts)
        chunk_base = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(-(-counts // chunk)).astype(jnp.int32)]
        )
        chunk_cap = pair_feats.shape[0] // chunk + n_tiles + 1
    else:
        chunk_base = jnp.zeros((1,), jnp.int32)
    inputs = [starts, eye, blocks_arg, chunk_base, pair_feats, dirs_pack]
    ray_specs = [
        pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if per_ray_origin:
        orig_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
        orig_pack = orig_pack.at[:, 0:3, :].set(
            jnp.transpose(origins_t, (0, 2, 1)).astype(jnp.float32)
        )
        inputs.append(orig_pack)
        ray_specs.append(
            pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        )

    # quad + per_ray_origin is supported: only the view-independent Q
    # columns are read (the eye-relative v/cq/oo columns are replaced by
    # the in-kernel tile-centered expansion) — the feature table must
    # still have been built with eye= so the Q block exists.
    if packed16 and (not quad or save_tin or block_mode):
        raise ValueError(
            "packed16 is the render-only quad fast path (no save_tin/blocks)"
        )
    if config.order in ("window", "merge") and chunk > 256:
        raise ValueError(
            "window/merge order packs the source index in 8 key bits: "
            "chunk <= 256"
        )
    kernel = functools.partial(
        _march_kernel,
        config=config,
        c=chunk,
        R=R,
        per_ray_origin=per_ray_origin,
        block_mode=block_mode,
        save_tin=save_tin,
        quad=quad,
        packed16=packed16,
        # whole-ray marches ([t_min, t_max] windows, no segment chaining):
        # the kernel may use the sqrt/div-free hit test
        full_range=(t_lo is None and t_hi is None and not block_mode
                    and not per_ray_origin),
        block_sub=block_sub,
    )
    out_specs = pl.BlockSpec(
        (1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n_tiles, 8, R), jnp.float32)
    scratch = [
        pltpu.VMEM((8, R), jnp.float32),
        pltpu.VMEM(
            (2, chunk + 16, F) if packed16 else (2, chunk, F),
            jnp.int16 if packed16 else jnp.float32,
        ),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if save_tin:
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.ANY))
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((chunk_cap, 8, R), jnp.float32),
        )
        scratch = scratch + [pltpu.SemaphoreType.DMA(())]
    if config.order == "merge":
        # cross-chunk pending buffer (key, alpha, packed colors)
        scratch = scratch + [
            pltpu.VMEM((chunk, R), jnp.int32),
            pltpu.VMEM((chunk, R), jnp.float32),
            pltpu.VMEM((chunk, R), jnp.int32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # features stay in HBM
            *ray_specs,
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    if save_tin:
        out, tin = out
        rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))  # (T, R, 3)
        return rgb, out[:, 3, :], tin, chunk_base
    rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))  # (T, R, 3)
    if stats:
        # per-tile count of chunks whose per-ray sort network actually ran
        # (row 4 telemetry). The window kernel counts per 128-lane GROUP
        # (constant within each group's lanes): max over lanes = chunks
        # where ANY group fired (the pre-split semantic); the mean over
        # lanes is the average per-group fire count (the split's actual
        # cost rate, <= the max when inversions localize to one group).
        return rgb, out[:, 3, :], (
            jnp.max(out[:, 4, :], axis=-1),  # chunks where a sort fired
            jnp.max(out[:, 5, :], axis=-1),  # fired chunks repaired by the
            #   span-bounded window network (config.sort_repair)
        )
    return rgb, out[:, 3, :]


def _march_bwd_kernel(
    starts_ref,  # scalar prefetch: (T+1,) int32
    eye_ref,  # scalar prefetch: (3,) float32
    chunk_base_ref,  # scalar prefetch: (T+1,) int32
    feats_hbm,  # (P_pad, F) float32 features
    tin_hbm,  # (chunk_cap, R) float32 per-chunk carry-in transmittance
    dirs_ref,  # (1, 8, R) rows 0..2 dir, 3 t_lo, 4 t_hi
    *rest,  # [orig_ref (1, 8, R) if per_ray_origin], dout_ref, dfeats_hbm,
    #         acc, fbuf, gbuf, tbuf, sems, wsem, tsem
    config: RenderConfig,
    c: int,
    R: int,
    per_ray_origin: bool = False,
):
    """Hand-written backward of the fused march (key or window order;
    shared origin or per-ray origins).

    Runs each tile's chunks in REVERSE, recomputing the forward response /
    prefix-product quantities from the streamed features (flash-attention
    style: nothing but the per-chunk carry-in transmittance is saved), and
    produces gradients w.r.t. every per-pair feature row. Stream rows are
    owned by exactly one (tile, chunk), so grads are written, not
    accumulated; a tail chunk's overshoot rows are written as zeros and
    then overwritten by the owning tile's later grid step (grid steps are
    sequential). Early-termination is treated as a non-differentiable
    cutoff, as in 3DGRT's backward.

    per_ray_origin: origins ride a second (1, 8, R) ray panel (rows 0..2)
    exactly as in the forward; o-dependent intermediates (o_g, oo) become
    (c, R) and their feature gradients gain a lane reduction — this is what
    lets rolling-shutter and bounced-segment renders train on the fused
    path (the reference has no backward at all, README.md:2).
    """
    rest = list(rest)
    orig_ref = rest.pop(0) if per_ray_origin else None
    dout_ref, dfeats_hbm, acc, fbuf, gbuf, tbuf, sems, wsem, tsem = rest
    t = pl.program_id(0)
    start = starts_ref[t]
    n = starts_ref[t + 1] - start
    n_chunks = pl.cdiv(n, c)
    f32 = jnp.float32
    minT = config.min_transmittance

    dirs = dirs_ref[0]
    dx, dy, dz = dirs[0:1, :], dirs[1:2, :], dirs[2:3, :]
    t_lo, t_hi = dirs[3:4, :], dirs[4:5, :]
    live = dx * dx + dy * dy + dz * dz > 0.01
    ex, ey, ez = eye_ref[0], eye_ref[1], eye_ref[2]

    dout = dout_ref[0]
    dR = [dout[ch : ch + 1, :] for ch in range(3)]  # (1, R) each
    acc[0:1, :] = dout[3:4, :]  # dT carry (d wrt this chunk's carry-OUT)

    tri_lo = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.bfloat16)
    tri_up = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(jnp.bfloat16)
    cand_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)

    sh_deg = config.sh_degree
    K = num_coeffs(sh_deg)
    basis = sh_basis_list(dx, dy, dz, sh_deg) if sh_deg > 0 else None

    def feat_dma(slot, j):
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(start + j * c, c), :], fbuf.at[slot], sems.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        feat_dma(0, n_chunks - 1).start()

    def body(jj, _):
        j = n_chunks - 1 - jj  # reverse order
        slot = jj % 2

        @pl.when(jj + 1 < n_chunks)
        def _():
            feat_dma((jj + 1) % 2, j - 1).start()

        feat_dma(slot, j).wait()
        tin_dma = pltpu.make_async_copy(
            tin_hbm.at[chunk_base_ref[t] + j], tbuf, tsem
        )
        tin_dma.start()
        tin_dma.wait()
        t_in = tbuf[3:4, :]  # (1, R) carry-in transmittance
        dT = acc[0:1, :]

        gbuf[:, :] = jnp.zeros_like(gbuf)

        @pl.when(jnp.max(t_in) > minT)
        def _():
            g = fbuf[slot]  # (c, F)
            col = lambda k: g[:, k : k + 1]
            m = [col(_M0 + k) for k in range(9)]
            op = col(_OP)
            rad = col(_RAD)
            if per_ray_origin:
                orow = orig_ref[0]  # (8, R)
                ox = orow[0:1, :] - col(_MX)  # (c, R)
                oy = orow[1:2, :] - col(_MY)
                oz = orow[2:3, :] - col(_MZ)
            else:
                ox = ex - col(_MX)  # (c, 1)
                oy = ey - col(_MY)
                oz = ez - col(_MZ)

            # ---- forward recompute (matches _march_kernel, key order) ----
            ogx = m[0] * ox + m[1] * oy + m[2] * oz
            ogy = m[3] * ox + m[4] * oy + m[5] * oz
            ogz = m[6] * ox + m[7] * oy + m[8] * oz
            dgx = m[0] * dx + m[1] * dy + m[2] * dz
            dgy = m[3] * dx + m[4] * dy + m[5] * dz
            dgz = m[6] * dx + m[7] * dy + m[8] * dz
            dd = dgx * dgx + dgy * dgy + dgz * dgz
            od = ogx * dgx + ogy * dgy + ogz * dgz
            oo = ogx * ogx + ogy * ogy + ogz * ogz
            dd_s = jnp.maximum(dd, 1e-6)
            t_star = -od / dd_s
            pp = oo + t_star * (2.0 * od + t_star * dd)
            resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
            alpha = jnp.minimum(config.alpha_clamp, resp * op)
            cq = oo - rad * rad
            disc = od * od - dd * cq
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            inv_dd = 1.0 / jnp.maximum(dd, 1e-12)
            t_entry = (-od - sq) * inv_dd
            t_exit = (-od + sq) * inv_dd
            t_event = jnp.where(t_entry < t_lo, t_exit, t_entry)
            in_window = (t_event >= t_lo) & (t_event <= t_hi)
            present = cand_idx < (n - j * c)
            gate = (
                present & (disc >= 0.0) & in_window & live
                & (alpha > config.alpha_min)
            )
            hm = config.hit_multiplicity
            a_eff = alpha if hm == 1 else 1.0 - (1.0 - alpha) ** hm
            a = jnp.where(gate, a_eff, 0.0)

            colors = []
            for ch in range(3):
                if sh_deg == 0:
                    raw = 0.5 + SH_C0 * col(_SH0 + ch * K)  # (c, 1)
                else:
                    raw = jnp.full((c, R), 0.5, f32)
                    for k in range(K):
                        raw = raw + basis[k] * col(_SH0 + ch * K + k)
                colors.append(raw)

            if config.order == "window":
                # ---- window order: replicate the forward's per-ray bitonic
                # sort BIT-EXACTLY (same unique keys, same skip test; the
                # source index lives in the key's low 8 bits). Gradients are
                # computed in the SORTED domain (where the forward's prefix
                # product ran), then permuted back by a second bitonic sort
                # keyed on the extracted source index — unique keys make
                # both networks true permutations, so the inverse is exact.
                # Only two payloads ride the inverse sort: d_a_s and w_s —
                # per-candidate color grads reconstruct from the per-RAY
                # cotangent as dR[ch] * w. Alpha is an exact float payload;
                # the 10-bit color pack is differentiated straight-through.
                # same ordering key as the forward (config.window_key)
                t_key = t_star if config.window_key == "peak" else t_event
                gated_t = jnp.where(a > 0.0, t_key, jnp.inf)
                t_min_c = jnp.min(gated_t)
                t_max_c = jnp.max(jnp.where(a > 0.0, t_key, -jnp.inf))
                t_rng = jnp.maximum(t_max_c - t_min_c, 1e-20)
                tq = jnp.clip(
                    (t_key - t_min_c) * (65534.0 / t_rng), 0.0, 65534.0
                ).astype(jnp.int32)
                src = jax.lax.broadcasted_iota(jnp.int32, (c, R), 0)
                zbase = jnp.int32(65535 << 8)
                skey = jnp.where(
                    a > 0.0, jax.lax.shift_left(tq, 8), zbase
                ) | src
                qz = lambda x: jnp.clip(x * 255.75, 0.0, 1023.0).astype(jnp.int32)
                cpack = (
                    jax.lax.shift_left(qz(jnp.maximum(colors[0], 0.0)), 20)
                    | jax.lax.shift_left(qz(jnp.maximum(colors[1], 0.0)), 10)
                    | qz(jnp.maximum(colors[2], 0.0))
                )
                cpack = jnp.broadcast_to(cpack, (c, R))
                apay = jnp.broadcast_to(a, (c, R))
                # MUST match the forward's skip decision bit-exactly: same
                # significance-gated running-max test on the same inputs
                sig_t = jnp.where(a > 0.0, t_key, -jnp.inf)
                rmax = _running_max_excl(sig_t, cand_idx)
                has_inv = jnp.any((a > 0.0) & (t_key < rmax))
                skey_s, (cpack_s, a_s) = jax.lax.cond(
                    has_inv,
                    lambda k, p: _bitonic_sort(k, p, c),
                    lambda k, p: (k, p),
                    skey, (cpack, apay),
                )
                src_s = skey_s & 255  # unique per lane: clean inverse key
                unq = lambda x: x.astype(f32) * (1.0 / 255.75)
                mask10 = jnp.int32(1023)
                colors_s = [
                    unq(jax.lax.shift_right_logical(cpack_s, 20) & mask10),
                    unq(jax.lax.shift_right_logical(cpack_s, 10) & mask10),
                    unq(cpack_s & mask10),
                ]

                lp = jnp.log1p(-a_s)
                S = _tri_dot(tri_lo, lp)
                E = jnp.exp(S)
                P = t_in * E
                gate_w = (P > minT).astype(f32)
                w_s = a_s * P * gate_w

                d_w = (
                    dR[0] * colors_s[0]
                    + dR[1] * colors_s[1]
                    + dR[2] * colors_s[2]
                )
                d_a_s = d_w * P * gate_w
                d_P = d_w * a_s * gate_w
                sumlp = jnp.sum(lp, axis=0, keepdims=True)  # (1, R)
                prod = jnp.exp(sumlp)
                acc[0:1, :] = dT * prod + jnp.sum(
                    d_P * E, axis=0, keepdims=True
                )
                d_lp = dT * t_in * prod + _tri_dot(tri_up, d_P * P)
                d_a_s = d_a_s - d_lp / (1.0 - a_s)

                # inverse permutation: ascending sort on the source index
                _, (d_a, w) = jax.lax.cond(
                    has_inv,
                    lambda k, p: _bitonic_sort(k, p, c),
                    lambda k, p: (k, p),
                    src_s, (d_a_s, w_s),
                )
            else:
                lp = jnp.log1p(-a)
                S = _tri_dot(tri_lo, lp)
                E = jnp.exp(S)
                P = t_in * E
                gate_w = (P > minT).astype(f32)
                w = a * P * gate_w

                d_w = jnp.zeros((c, R), f32)
                for ch in range(3):
                    d_w = d_w + dR[ch] * jnp.maximum(colors[ch], 0.0)
                d_a = d_w * P * gate_w
                d_P = d_w * a * gate_w
                sumlp = jnp.sum(lp, axis=0, keepdims=True)  # (1, R)
                prod = jnp.exp(sumlp)
                # carry to the PREVIOUS chunk's carry-out
                acc[0:1, :] = dT * prod + jnp.sum(
                    d_P * E, axis=0, keepdims=True
                )
                d_lp = dT * t_in * prod + _tri_dot(tri_up, d_P * P)
                d_a = d_a - d_lp / (1.0 - a)

            # color/SH grads (w is in ORIGINAL candidate order in both paths)
            for ch in range(3):
                mask = (colors[ch] > 0.0).astype(f32)
                d_col = dR[ch] * w  # (c, R)
                if sh_deg == 0:
                    gbuf[:, _SH0 + ch * K : _SH0 + ch * K + 1] = SH_C0 * jnp.sum(
                        d_col * mask, axis=1, keepdims=True
                    )
                else:
                    dcm = d_col * mask
                    for k in range(K):
                        gbuf[:, _SH0 + ch * K + k : _SH0 + ch * K + k + 1] = (
                            jnp.sum(dcm * basis[k], axis=1, keepdims=True)
                        )

            if hm == 1:
                d_alpha = d_a
            else:
                d_alpha = d_a * hm * (1.0 - alpha) ** (hm - 1)
            d_alpha = jnp.where(gate, d_alpha, 0.0)
            notclamp = (resp * op < config.alpha_clamp).astype(f32)
            d_resp = d_alpha * op * notclamp
            gbuf[:, _OP : _OP + 1] = jnp.sum(
                d_alpha * resp * notclamp, axis=1, keepdims=True
            )
            d_pp = -0.5 * resp * d_resp * (pp > 0.0).astype(f32)
            red = lambda x: jnp.sum(x, axis=1, keepdims=True)
            # pp = oo - od^2/dd (dd > eps branch)
            d_od = d_pp * (-2.0 * od / dd_s)
            d_dd = d_pp * (od * od / (dd_s * dd_s))
            d_dgx = d_od * ogx + 2.0 * dgx * d_dd
            d_dgy = d_od * ogy + 2.0 * dgy * d_dd
            d_dgz = d_od * ogz + 2.0 * dgz * d_dd
            if per_ray_origin:
                # o_g and oo are (c, R): keep d_og* per-ray and reduce at
                # the feature columns instead
                d_oo = d_pp
                d_ogx = d_od * dgx + 2.0 * ogx * d_oo
                d_ogy = d_od * dgy + 2.0 * ogy * d_oo
                d_ogz = d_od * dgz + 2.0 * ogz * d_oo
                d_m = [
                    red(d_dgx * dx + d_ogx * ox),
                    red(d_dgx * dy + d_ogx * oy),
                    red(d_dgx * dz + d_ogx * oz),
                    red(d_dgy * dx + d_ogy * ox),
                    red(d_dgy * dy + d_ogy * oy),
                    red(d_dgy * dz + d_ogy * oz),
                    red(d_dgz * dx + d_ogz * ox),
                    red(d_dgz * dy + d_ogz * oy),
                    red(d_dgz * dz + d_ogz * oz),
                ]
                d_ox = red(m[0] * d_ogx + m[3] * d_ogy + m[6] * d_ogz)
                d_oy = red(m[1] * d_ogx + m[4] * d_ogy + m[7] * d_ogz)
                d_oz = red(m[2] * d_ogx + m[5] * d_ogy + m[8] * d_ogz)
            else:
                d_oo = red(d_pp)  # (c, 1)
                d_ogx = red(d_od * dgx) + 2.0 * ogx * d_oo
                d_ogy = red(d_od * dgy) + 2.0 * ogy * d_oo
                d_ogz = red(d_od * dgz) + 2.0 * ogz * d_oo
                d_m = [
                    red(d_dgx * dx) + d_ogx * ox,
                    red(d_dgx * dy) + d_ogx * oy,
                    red(d_dgx * dz) + d_ogx * oz,
                    red(d_dgy * dx) + d_ogy * ox,
                    red(d_dgy * dy) + d_ogy * oy,
                    red(d_dgy * dz) + d_ogy * oz,
                    red(d_dgz * dx) + d_ogz * ox,
                    red(d_dgz * dy) + d_ogz * oy,
                    red(d_dgz * dz) + d_ogz * oz,
                ]
                d_ox = m[0] * d_ogx + m[3] * d_ogy + m[6] * d_ogz
                d_oy = m[1] * d_ogx + m[4] * d_ogy + m[7] * d_ogz
                d_oz = m[2] * d_ogx + m[5] * d_ogy + m[8] * d_ogz
            for k in range(9):
                gbuf[:, _M0 + k : _M0 + k + 1] = d_m[k]
            gbuf[:, _MX : _MX + 1] = -d_ox  # ox = origin_x - mx
            gbuf[:, _MY : _MY + 1] = -d_oy
            gbuf[:, _MZ : _MZ + 1] = -d_oz
            # rad only gates hits (discontinuous): zero grad, as in 3DGRT

        wdma = pltpu.make_async_copy(
            gbuf, dfeats_hbm.at[pl.ds(start + j * c, c), :], wsem
        )
        wdma.start()
        wdma.wait()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0, unroll=False)


@functools.partial(
    jax.jit,
    static_argnames=("config", "n_tiles", "rays_per_tile", "chunk", "interpret"),
)
def pallas_march_bwd(
    starts: jnp.ndarray,
    eye: jnp.ndarray,
    pair_feats: jnp.ndarray,  # (P_pad, F)
    dirs_t: jnp.ndarray,  # (T, R, 3)
    tin: jnp.ndarray,  # (chunk_cap, 8, R) saved acc panels (row 3 = T_in)
    chunk_base: jnp.ndarray,  # (T+1,)
    d_rgb_t: jnp.ndarray,  # (T, R, 3)
    d_tfinal: jnp.ndarray,  # (T, R)
    config: RenderConfig,
    n_tiles: int,
    rays_per_tile: int,
    chunk: int,
    interpret: bool = False,
    origins_t: jnp.ndarray | None = None,  # (T, R, 3) per-ray origins
    t_lo: jnp.ndarray | None = None,  # (T, R) per-ray window
    t_hi: jnp.ndarray | None = None,
):
    """d(pair_feats) for the fused march (key or window order; shared
    origin, or per-ray origins/windows for rolling-shutter and bounced
    segments)."""
    R = rays_per_tile
    F = pair_feats.shape[1]
    dirs_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
    dirs_pack = dirs_pack.at[:, 0:3, :].set(jnp.transpose(dirs_t, (0, 2, 1)))
    dirs_pack = dirs_pack.at[:, 3, :].set(
        jnp.full((n_tiles, R), config.t_min, jnp.float32) if t_lo is None else t_lo
    )
    dirs_pack = dirs_pack.at[:, 4, :].set(
        jnp.full((n_tiles, R), config.t_max, jnp.float32) if t_hi is None else t_hi
    )
    dout_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
    dout_pack = dout_pack.at[:, 0:3, :].set(jnp.transpose(d_rgb_t, (0, 2, 1)))
    dout_pack = dout_pack.at[:, 3, :].set(d_tfinal)

    per_ray_origin = origins_t is not None
    inputs = [starts, eye, chunk_base, pair_feats, tin, dirs_pack]
    ray_specs = [
        pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if per_ray_origin:
        orig_pack = jnp.zeros((n_tiles, 8, R), jnp.float32)
        orig_pack = orig_pack.at[:, 0:3, :].set(
            jnp.transpose(origins_t, (0, 2, 1)).astype(jnp.float32)
        )
        inputs.append(orig_pack)
        ray_specs.append(
            pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    inputs.append(dout_pack)
    ray_specs.append(
        pl.BlockSpec((1, 8, R), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    )

    kernel = functools.partial(
        _march_bwd_kernel, config=config, c=chunk, R=R,
        per_ray_origin=per_ray_origin,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # features
            pl.BlockSpec(memory_space=pltpu.ANY),  # tin
            *ray_specs,
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, R), jnp.float32),
            pltpu.VMEM((2, chunk, F), jnp.float32),
            pltpu.VMEM((chunk, F), jnp.float32),
            pltpu.VMEM((8, R), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    d_feats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(pair_feats.shape, jnp.float32),
        interpret=interpret,
    )(*inputs)
    # rows outside [starts[0], starts[T]) are never written by any of THESE
    # tiles (starts[0] != 0 when a shard owns an interior tile range)
    slot = jnp.arange(pair_feats.shape[0], dtype=jnp.int32)
    covered = (slot >= starts[0]) & (slot < starts[n_tiles])
    return jnp.where(covered[:, None], d_feats, 0.0)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9)
)
def march_stream_diff(
    starts, eye, pair_feats, dirs_t,
    config: RenderConfig, n_tiles: int, rays_per_tile: int, chunk: int,
    interpret: bool, quad: bool = False,
    origins_t=None, t_lo=None, t_hi=None, t0=None,
):
    """Differentiable fused march (key or window order): the forward is the
    Pallas march kernel, the backward is the hand-written reverse-sweep
    kernel producing d(pair_feats) (BASELINE north star: fused kernels with
    a hand-written backward for means/covariance/opacity/SH — the feature
    rows carry exactly those).

    quad (key order only): the forward uses the f32 VPU quadratic-form
    response columns; the backward recomputes the algebraically identical
    scalar form (gradients agree to f32 rounding). Window order keeps the
    scalar forward: its backward replays the forward's sort network
    BIT-EXACTLY, and a quad-vs-scalar rounding difference in the 16-bit
    key quantization could diverge the replayed permutation.

    origins_t / t_lo / t_hi / t0 (all optional, differentiated as zero —
    ray geometry is non-diff like dirs_t): per-ray origins, march windows,
    and carry-in transmittance, enabling TRAINING through rolling-shutter
    renders and bounced segments (the quad fast path stays shared-origin:
    its feature columns bake the eye in)."""
    if config.order == "merge":
        raise ValueError(
            "order='merge' is a forward-render optimization; train with "
            "order='window' or 'key' (the backward kernel replays those)"
        )
    if quad and config.order != "key":
        raise ValueError("quad training requires order='key' (see docstring)")
    rgb, t_final = pallas_march_stream(
        starts, eye, pair_feats, dirs_t, config,
        n_tiles=n_tiles, rays_per_tile=rays_per_tile, chunk=chunk,
        interpret=interpret, quad=quad,
        origins_t=origins_t, t_lo=t_lo, t_hi=t_hi, t0=t0,
    )
    return rgb, t_final


def _march_diff_fwd(starts, eye, pair_feats, dirs_t, config, n_tiles,
                    rays_per_tile, chunk, interpret, quad=False,
                    origins_t=None, t_lo=None, t_hi=None, t0=None):
    if quad and config.order != "key":
        raise ValueError("quad training requires order='key'")
    rgb, t_final, tin, chunk_base = pallas_march_stream(
        starts, eye, pair_feats, dirs_t, config,
        n_tiles=n_tiles, rays_per_tile=rays_per_tile, chunk=chunk,
        interpret=interpret, save_tin=True, quad=quad,
        origins_t=origins_t, t_lo=t_lo, t_hi=t_hi, t0=t0,
    )
    res = (starts, eye, pair_feats, dirs_t, tin, chunk_base,
           origins_t, t_lo, t_hi, t0)
    return (rgb, t_final), res


def _march_diff_bwd(config, n_tiles, rays_per_tile, chunk, interpret, quad,
                    res, ct):
    import numpy as _np

    (starts, eye, pair_feats, dirs_t, tin, chunk_base,
     origins_t, t_lo, t_hi, t0) = res
    d_rgb_t, d_tfinal = ct
    d_feats = pallas_march_bwd(
        starts, eye, pair_feats, dirs_t, tin, chunk_base, d_rgb_t, d_tfinal,
        config, n_tiles=n_tiles, rays_per_tile=rays_per_tile, chunk=chunk,
        interpret=interpret, origins_t=origins_t, t_lo=t_lo, t_hi=t_hi,
    )
    d_starts = _np.zeros(starts.shape, dtype=jax.dtypes.float0)
    zlike = lambda x: None if x is None else jnp.zeros_like(x)
    return (d_starts, jnp.zeros_like(eye), d_feats, jnp.zeros_like(dirs_t),
            zlike(origins_t), zlike(t_lo), zlike(t_hi), zlike(t0))


march_stream_diff.defvjp(_march_diff_fwd, _march_diff_bwd)
