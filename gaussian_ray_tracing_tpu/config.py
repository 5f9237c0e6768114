"""Render configuration.

Every hardcoded constant of the reference is exposed here as a field, with
defaults equal to the reference values so that default-config renders are
numerically parity-comparable. Citations refer to files under
``/root/reference`` (Ray-Studio2/gaussian-ray-tracing).
"""

from __future__ import annotations

import dataclasses
import enum
import math


class CameraModel(enum.Enum):
    PINHOLE = "pinhole"
    FISHEYE = "fisheye"
    # pinhole + OpenCV radial/tangential distortion (k1,k2,p1,p2,k3..k6);
    # a 3DGRUT capability beyond the reference (tracer.cuh:115-165 has
    # pinhole and equisolid fisheye only)
    OPENCV = "opencv"


class MeshType(enum.IntEnum):
    """Secondary-ray interaction type for inserted triangle meshes.

    Mirrors ``MeshType`` in the reference (src/Parameters.h:80-85).
    """

    MIRROR = 0
    NORMAL = 1
    GLASS = 2


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (hashable) renderer configuration.

    Defaults reproduce the reference exactly:
      - t_min/t_max/min_transmittance/alpha_min: src/GaussianTracer.cpp:479-486
      - k-buffer size 7, bounce/timeout caps, mesh-trace epsilons:
        shaders/tracer.cuh:9-14
      - per-hit alpha clamp 0.99: shaders/tracer.cuh:357
      - sh_degree 0 at runtime (eval exists for 0-3): src/GaussianTracer.cpp:483
      - fisheye equisolid f=1/sqrt(2): shaders/tracer.cuh:158
      - glass/air IOR 1.5/1.0003: shaders/tracer.cuh:477-479
    """

    # --- Gaussian pass (src/GaussianTracer.cpp:479-486) ---
    t_min: float = 1e-3
    t_max: float = 1e5
    min_transmittance: float = 1e-3
    alpha_min: float = 0.01
    alpha_clamp: float = 0.99
    sh_degree: int = 0

    # --- Mesh (secondary-bounce) pass (shaders/tracer.cuh:9-14) ---
    mesh_t_min: float = 1e-5
    mesh_t_max: float = 1e5
    max_bounces: int = 32
    # NOTE: the reference's TIMEOUT_ITERATIONS=1000 (shaders/tracer.cuh:13)
    # guards its UNBOUNDED per-pixel while-loops against runaway traversal.
    # There is deliberately no equivalent field here: every loop in this
    # framework is a bounded lax.fori_loop/cond chain (max_bounces for
    # bounces, n_chunks for the march), so a watchdog cap cannot fire by
    # construction — a trip count is always statically known to XLA.
    refraction_eps_shift: float = 1e-5
    glass_ior: float = 1.5
    air_ior: float = 1.0003
    mesh_type: MeshType = MeshType.MIRROR

    # --- Hit-multiplicity compatibility knob ---
    # The reference builds its BVH over closed icosahedron proxy hulls with no
    # backface culling (src/GaussianTracer.cpp:355-360,417: flags are all
    # OPTIX_*_FLAG_NONE), so each particle is inserted into the anyhit k-buffer
    # TWICE per ray (hull entry + hull exit triangles, shaders/tracer.cu:136-153)
    # and front-to-back composited twice with the same alpha
    # (shaders/tracer.cuh:349-368).  hit_multiplicity=2 reproduces that
    # behavior exactly (alpha_eff = 1-(1-a)^2 = a*(2-a));  hit_multiplicity=1
    # gives the mathematically standard single-evaluation volume rendering of
    # 3DGRT / official 3DGRUT.
    hit_multiplicity: int = 2

    # --- Camera ---
    camera_model: CameraModel = CameraModel.PINHOLE
    # Equisolid fisheye focal (shaders/tracer.cuh:158): f = 1/sqrt(2)
    fisheye_focal: float = 1.0 / math.sqrt(2.0)
    # OPENCV model coefficients (k1, k2, p1, p2[, k3[, k4, k5, k6]]) on
    # normalized camera coords; () = no distortion (== PINHOLE)
    distortion: tuple = ()

    # --- Tiled-renderer (TPU fast path) knobs; no reference analog ---
    tile_w: int = 16
    tile_h: int = 16
    # Capacity of each tile's depth-sorted candidate list (XLA tiled march
    # only; the pair-stream Pallas path has no per-tile cap).
    max_per_tile: int = 1024
    # Candidate chunk processed per inner step of the march kernel.
    march_chunk: int = 256
    # Hit ordering inside the march:
    #   "key"     — global per-tile depth-key order only (fastest; the
    #               standard sorted-splatting approximation)
    #   "window"  — additionally re-sorts each march chunk per ray by its own
    #               exact event t (bounded-window per-ray ordering; inversions
    #               wider than march_chunk candidates remain approximate)
    #   "oddeven" — window ordering via window_passes odd-even transposition
    #               passes instead of a full sort (fixes displacements up to
    #               window_passes; what the Pallas kernel implements)
    # The oracle renderer is always exactly per-ray ordered.
    order: str = "window"
    # Number of odd-even compare-exchange passes for order="oddeven".
    window_passes: int = 16
    # Per-ray ordering key inside the window sort: "event" = the oracle's
    # iso-ellipsoid entry/exit t (tracer.cu:124-153 k-buffer semantics);
    # "peak" = the max-response t* along the ray — needs no sqrt/divide in
    # the march (t* = -od/dd is already computed for the response) but is
    # quality-DEAD vs the reference semantics (~25 dB at 96x64: the oracle
    # composites in event order, and t* ordering genuinely diverges where
    # anisotropic tails overlap). Keep "event" for anything parity-grade;
    # "peak" exists for speed experiments only.
    window_key: str = "event"
    # Pair sort keys: "gaussian" (default) = one shared per-gaussian depth
    # key (the iso-ellipsoid entry t along the eye->center ray). Measured
    # BEST: per-pair keys along each pair's own tile central ray — whether
    # exact ("tile" entry-t, "tile_peak" peak-t, one extra wide gather) or
    # the gather-free affine log-t model ("affine",
    # ops/tiles.affine_tile_keys) — are all WORSE (96x64 adversarial scene,
    # key order: gaussian 27.4 dB, tile 24.3, tile_peak 21.9, affine 21.7;
    # window order: 43.7 / 32.1 / 29.8 / 29.2): a tile ray that grazes a
    # far-from-center footprint yields a noisy, unrepresentative depth,
    # while the gaussian's own central ray samples it where its mass is.
    pair_keys: str = "gaussian"
    # Exact projected-conic bounding boxes for pinhole footprints (the
    # support-function quadratic per axis) instead of the conservative
    # extent/z_near rect; lossless (the march's alpha_min cutoff is the
    # iso-ellipsoid test) and strictly tighter, so every downstream stage
    # sees fewer (tile, gaussian) pairs. Zero per-pair cost.
    exact_bbox: bool = True
    # Per-pair projected-conic vs tile-rect cull in the pair expansion
    # (pinhole only): drops bbox-corner tiles the gaussian's exact hit
    # conic cannot touch. Conservative by construction — a pair is culled
    # only when max over the tile's NDC rect of the line-hit quadratic is
    # provably below the alpha_min level set the march gates on, so the
    # rendered image is unchanged while the march skips the dead pairs.
    # DEFAULT OFF: the on-chip A/B (scripts/ab_march.py, r3) measured the
    # cull's expansion cost (+6 head-fill channels + per-pair conic eval)
    # at ~+4 ms/frame vs ~-2 ms of march savings from the 21.6% pair drop
    # — a net 3 Mrays/s regression at the 720p/100k bench config.
    conic_cull: bool = False
    # Fisheye annular-sector cull in the pair expansion: the fisheye
    # footprint rect is the bbox of an annular sector (radius in
    # [r_lo, r_hi], azimuth in a wedge) in NDC around the optical center,
    # and the bbox over-covers it badly — a count-weighted brute-force
    # sample at the 768^2/100k bench config measured 68% of emitted pairs
    # DEAD (no pixel in the tile has a live ray). Each expanded pair is
    # tested against its gaussian's sector (conservative radial + wedge
    # support tests with a pad covering the rect's own margins); dead
    # pairs drop before the tile sort, so the march and its ordering
    # shrink ~3x while prep slots stay (same economics as conic_cull, but
    # at 3x the kill rate). Default set by on-chip A/B (PERF.md round 5).
    fisheye_cull: bool = False
    # 3-zone row-span expansion (pinhole): each gaussian's TOP and BOTTOM
    # tile rows emit only the exact conic x-span for that row's NDC slab
    # (single-row gaussians get their exact span), middle rows keep the
    # rect's full width. Dead corner/edge pairs are never EMITTED, so the
    # O(P) head fills, the tile sort, the feature gather and the march all
    # shrink with the pair count — unlike conic_cull, which pays per-pair
    # math to invalidate pairs that still occupy stream slots. Lossless
    # (outside the conic the march's alpha_min gate composites nothing).
    # On-chip A/B (scripts/ab_rowspan.py, r3): -17.4% pairs; 29.42 -> 30.10
    # Mrays/s (window/128) and 41.42 -> 44.00 (key) with re-snugged caps —
    # but once packed16 halved the gather, the -17% downstream savings no
    # longer cover the expansion's +3.9 ms decode cost (27.88 vs 26.93 ms
    # at window/128): DEFAULT OFF; enable for gather/march-dominated
    # configs (high-res, wide scenes).
    row_span: bool = False
    # int16 bit-split quad feature table for the production render: the
    # bandwidth-bound (P, 128) pair gather moves 256 B rows instead of
    # 512 B with bit-exact f32 reassembly in the kernel. On-chip frame
    # A/B (r3): window/128 30.88 -> 27.88 ms, key 23.26 -> 20.28.
    # Render-only (training/bounce paths keep the f32 table).
    packed16: bool = True
    # Evaluate per-ray SH radiance (sh_degree >= 1) inside the march kernel
    # as per-channel (c, K) @ (K, R) bf16 hi/lo MXU contractions instead of
    # ~6K VPU broadcast multiply-adds. Numerically within ~4e-6 relative of
    # the VPU loop (hi/lo split keeps 18 mantissa bits through the MXU).
    # The kernel applies this only under sort orders (window/merge), where
    # the VPU is saturated and the MXU idle: measured +3.1 ms there and
    # -2.7 ms in key order (PERF.md round-3 kernel matrix).
    sh_mxu: bool = True
    # Hit ordering for BOUNCED gaussian segments (the morton-block march
    # of models/mesh_tracer.render_with_mesh_fast). "window" matches the
    # primary march's parity-grade per-ray ordering; "key" composites in
    # near-to-far block order only — block-ordered chunks fire the window
    # sort on nearly every chunk (unlike the depth-presorted primary
    # stream), so "key" trades bounded ordering error inside each
    # 128-gaussian block for skipping the bitonic network entirely.
    bounce_order: str = "window"
    # Per-tile near-to-far morton-block budget for bounced segments
    # (ops/blocks.block_stream max_per_tile): blocks beyond it are the
    # tile's FARTHEST, which early termination under the carried
    # transmittance rarely reaches.
    bounce_block_budget: int = 16
    # Morton blocks streamed per march chunk in the bounced block march
    # (kernel chunk = this * march block size): the block march is
    # chunk-COUNT-bound (per-chunk fixed costs dominate its ~2048
    # candidate evals/ray), so packing 2 blocks per chunk halves that
    # overhead at unchanged candidate work. Default set by on-chip A/B
    # (PERF.md round 5).
    bounce_blocks_per_chunk: int = 1
    # Split the window sort's fire test + network into independent 128-lane
    # groups (render-only; R must be a multiple of 128). The idea: a (c, R)
    # sort network costs R/128x the (c, 128) one, so an inversion confined
    # to one half of the tile would pay a half-width network. Implemented
    # Mosaic-legally (per-group VMEM carry loads + per-group acc stores; a
    # register slice of the (1, R) carry has a lane-offset layout whose
    # broadcast Mosaic rejects — the round-3 bench regression). DEFAULT
    # OFF: the on-chip A/B (quick_ab, r4) measured 26.35 ms vs 25.61 at
    # the 720p/100k bench config — the bench scene's inversions span whole
    # gaussians (both lane groups fire together) so the split only adds
    # per-group cond/bookkeeping overhead. Kept for scenes with localized
    # inversions.
    sort_lane_groups: bool = False
    # Evaluate the march's front-to-back prefix product as a VPU doubling
    # scan (log2(c) roll/select/multiply steps, no transcendentals) instead
    # of the exp(L @ log1p) bf16-split MXU contraction. Render-only: the
    # training forward (save_tin) keeps the MXU form so the hand-written
    # backward's recompute sees identical rounding. Default set by on-chip
    # A/B (PERF.md round 5).
    composite_scan: bool = False
    # Span-bounded window-sort repair (render-only, 0 = off): when the
    # window sort fires, locate the contiguous index band [i0, i1] that
    # actually contains every out-of-place element (i1 = last element below
    # its exclusive running max — the fire test's own violation mask; i0 =
    # first element above its reverse exclusive running min) and, when the
    # band fits, sort only a sort_repair-wide sublane window around it
    # instead of the full march_chunk-wide bitonic network. Exact: sorting
    # any contiguous window containing the band reproduces the full sort's
    # significant order. DEFAULT 64 by on-chip A/B (PERF.md round 5):
    # ~-0.8 ms at the bench config (34% of fired chunks repair at w=64;
    # wider bands fall back to the full network). Exact to sort-tie level.
    sort_repair: int = 64
    # Weight-aware window-sort firing (render-only, 0 = exact): the fire
    # test ignores inversions confined to candidates with alpha at or
    # below this. Swapping candidates i < j changes the image by at most
    # a_i * a_j * T per channel, so chunks whose only inversions involve
    # near-transparent tails composite in stream order instead of paying
    # the bitonic network; fired chunks still sort everything. Default
    # set by on-chip A/B against the 720p golden (PERF.md round 5).
    sort_alpha_min: float = 0.0
    # Chunk-level early-exit threshold for the fused march (render-only):
    # a tile's remaining chunks are skipped once EVERY ray's transmittance
    # is <= this. At min_transmittance (the default) this is exactly the
    # reference's per-ray stop lifted to the tile (zero-error); raising it
    # bounds each ray's dropped remainder by the threshold per channel
    # (e.g. 0.01 -> worst-case ~40 dB floor per affected pixel, in
    # practice far above). Training always uses min_transmittance.
    # DEFAULT 0.02 by on-chip A/B (PERF.md round 5): -2.3 ms/frame at the
    # 720p/100k bench config with the 720p golden at 52.09 dB (52.14 at
    # the exact 1e-3) — the error bound is extremely conservative because
    # skipped tails are partial and rare. Cross-path equality tests pin
    # this to min_transmittance (the XLA tiled scan cannot skip chunks).
    chunk_skip_transmittance: float = 0.02
    # Compute/composite dtype for the fast path ("float32" or "bfloat16").
    compute_dtype: str = "float32"
    # Use the fused Pallas kernel for the per-tile march (False = pure-JAX path).
    use_pallas: bool = False

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)

    @property
    def rays_per_tile(self) -> int:
        return self.tile_w * self.tile_h


DEFAULT_CONFIG = RenderConfig()
