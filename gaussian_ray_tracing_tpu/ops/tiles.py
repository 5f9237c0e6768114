"""Tile binning: the TPU-native acceleration structure.

Where the reference builds an OptiX two-level BVH over per-particle
icosahedron proxy hulls and traverses it per ray
(src/GaussianTracer.cpp:297-317, shaders/tracer.cu:124-153), the TPU design
is sort-based and data-parallel: every gaussian's conservative screen
footprint is expanded into (tile, depth, gaussian) pairs, the pairs are
sorted once per frame by a single packed int32 key, and each tile ends up
owning a contiguous depth-ordered segment of the sorted pair stream.

The pair expansion is gather-based (repeat-via-cummax), not scatter-based:
a scatter-per-footprint-cell loop costs ~5 cycles/element on TPU and caps
the frame rate; marking each gaussian's first pair slot with a scatter-max
of its id and forward-filling with a cumulative max costs one O(N) scatter
plus one O(P) cummax. All per-pair context then arrives through one packed
row gather (row gathers are row-count-bound on TPU: ~2 M rows cost the same
for 1..128 columns, while separate 1-column gathers are ~50x slower).

The footprint is a bounding sphere of the adaptive iso-ellipsoid
(radius_canonical * max(scale), with radius_canonical =
sqrt(2 ln(opacity/alpha_min)) — src/GaussianTracer.cpp:306), so culling is
conservative: the exact per-ray alpha_min test in the march (equivalent to
the ellipsoid hit test by construction of the adaptive radius) discards
false positives. There is no footprint span cap: arbitrarily wide
footprints (e.g. gaussians enclosing the camera) emit one pair per covered
tile.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig

_INT32_MAX = jnp.iinfo(jnp.int32).max


class PairStream(NamedTuple):
    """Sorted (tile, depth, gaussian) pair stream.

    Tile t owns the contiguous slots [starts[t], starts[t+1]); within a
    segment, pairs are ordered by view depth (front to back).

    When `order` is not None (the default pre-sorted expansion path), gid
    values are DEPTH RANKS: consumers must index per-gaussian tables that
    were reordered as table[order]. When None (the experimental per-pair
    key paths), gid values are original gaussian ids.
    """

    gid: jnp.ndarray  # (P,) int32 gaussian ids/ranks, -1 in empty slots
    key: jnp.ndarray  # (P,) int32 sorted keys (tile, or tile<<db|depth_q)
    starts: jnp.ndarray  # (n_tiles+1,) int32 segment starts
    n_pairs: jnp.ndarray  # () int32 pairs emitted (pre-clip)
    n_dropped: jnp.ndarray  # () int32 pairs lost to capacity overflow
    order: jnp.ndarray | None = None  # (N,) depth perm; gid is rank space


class TileBinning(NamedTuple):
    """Fixed-capacity per-tile candidate-list view of a PairStream (the
    layout consumed by the pure-XLA tiled march)."""

    cand: jnp.ndarray  # (T, m_cap) int32 gaussian ids/ranks, -1 = empty
    counts: jnp.ndarray  # (T,) int32 candidates per tile (clipped to m_cap)
    n_pairs: jnp.ndarray  # () int32 total emitted pairs
    n_dropped: jnp.ndarray  # () int32 pairs lost to capacity / per-tile caps
    order: jnp.ndarray | None = None  # see PairStream.order


class Footprint(NamedTuple):
    px: jnp.ndarray  # (N,) pixel-space center x
    py: jnp.ndarray  # (N,) pixel-space center y
    rx: jnp.ndarray  # (N,) conservative pixel half-extent x
    ry: jnp.ndarray  # (N,) conservative pixel half-extent y
    depth: jnp.ndarray  # (N,) front-to-back sort key (positive)
    visible: jnp.ndarray  # (N,) bool
    # fisheye only: the ANNULAR-SECTOR the rect is the bbox of, in NDC
    # around the optical center — (cphi, sphi, cos_dphi, r_lo, r_hi);
    # cos_dphi = -1 marks all-azimuth (wrap/degenerate). The bbox of a
    # sector over-covers it badly (measured 68% dead pairs at the 768^2
    # bench config), so the pair expansion can cull rect tiles provably
    # outside the sector (config.fisheye_cull).
    sector: tuple | None = None


_MARGIN = 1.1  # multiplicative footprint safety margin
_EPS = 1e-6


def num_tiles(camera: Camera, config: RenderConfig) -> tuple[int, int]:
    tx_n = -(-camera.width // config.tile_w)
    ty_n = -(-camera.height // config.tile_h)
    return tx_n, ty_n


def camera_axis_extents(
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    radius: jnp.ndarray,
    camera: Camera,
):
    """Tight world-space half-extents of each iso ellipsoid along the camera
    basis axes: extent along unit v is radius * |S R^T v| (the support
    function of the ellipsoid x = mu + R S u, |u| = radius). For anisotropic
    gaussians this is far tighter than the bounding sphere radius*max(scale)
    and cuts (tile, gaussian) pair count across the whole pipeline."""
    from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat

    U, V, W = camera.uvw_frame()
    u_hat = U / jnp.maximum(jnp.linalg.norm(U), 1e-12)
    v_hat = V / jnp.maximum(jnp.linalg.norm(V), 1e-12)
    w_hat = W / jnp.maximum(jnp.linalg.norm(W), 1e-12)
    R = quat_to_rotmat(quats)  # (N, 3, 3)

    def ext(axis):
        rta = jnp.einsum("nji,j->ni", R, axis)  # R^T axis
        return radius * jnp.linalg.norm(scales * rta, axis=-1)

    return ext(u_hat), ext(v_hat), ext(w_hat)


def _distort_rect_px(xc, yc, hx, hy, camera: Camera, config: RenderConfig):
    """Map an IDEAL-NDC rect (center (xc, yc), half-extent (hx, hy), all
    (N,)) through the forward OPENCV distortion to a conservative pixel
    rect: 8 boundary samples + center are distorted and boxed, with a
    multiplicative + additive margin absorbing boundary curvature between
    samples. Conservative for the moderate coefficient magnitudes real
    OPENCV calibrations carry (containment is tested); pathological
    coefficients may need a larger margin."""
    from gaussian_ray_tracing_tpu.cameras import distort_opencv

    U, V, W = camera.uvw_frame()
    wlen = jnp.linalg.norm(W)
    cu = jnp.linalg.norm(U) / wlen
    cv = jnp.linalg.norm(V) / wlen
    Wpx, Hpx = camera.width, camera.height

    xs = (xc - hx, xc, xc + hx)
    ys = (yc - hy, yc, yc + hy)
    px_lo = px_hi = py_lo = py_hi = None
    for i, sx in enumerate(xs):
        for j, sy in enumerate(ys):
            xd, yd = distort_opencv(sx * cu, sy * cv, config.distortion)
            pxs = (xd / cu + 1.0) * 0.5 * Wpx
            pys = (yd / cv + 1.0) * 0.5 * Hpx
            px_lo = pxs if px_lo is None else jnp.minimum(px_lo, pxs)
            px_hi = pxs if px_hi is None else jnp.maximum(px_hi, pxs)
            py_lo = pys if py_lo is None else jnp.minimum(py_lo, pys)
            py_hi = pys if py_hi is None else jnp.maximum(py_hi, pys)
    px = 0.5 * (px_lo + px_hi)
    py = 0.5 * (py_lo + py_hi)
    rx = 0.5 * (px_hi - px_lo) * 1.15 + 2.0
    ry = 0.5 * (py_hi - py_lo) * 1.15 + 2.0
    return px, py, rx, ry


def project_footprints_conic(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    quats: jnp.ndarray,
    radius: jnp.ndarray,
    bound_radius: jnp.ndarray,
    camera: Camera,
    config: RenderConfig,
) -> Footprint:
    """Exact pinhole footprints: the tight bounding box of each iso
    ellipsoid's projected conic.

    The projection of the ellipsoid x = mu + radius * R S u (|u| <= 1) from
    the eye is a conic in NDC; its extremal ndc_x is where the plane
    n(k) = cc*u' - k*w_hat (the boundary of {ndc_x >= k}) supports the
    ellipsoid:  n.(mu - eye) = -radius * |S R^T n|.  With the per-gaussian
    scalars  B = (mu-eye).w_hat,  X = (mu-eye).n0  (n0 = cc*u'),  and the
    vectors  P = S R^T n0,  Q = S R^T w_hat,  this squares to the quadratic
    a k^2 - 2 b k + c = 0 with

        a = B^2 - r^2 |Q|^2,   b = X B - r^2 P.Q,   c = X^2 - r^2 |P|^2,

    whose discriminant is computed in the cancellation-free product form
    b^2 - a c = r^2 (|B P - X Q|^2 - r^2 |P x Q|^2).  The roots are the
    exact NDC interval of the projection.  Valid whenever the ellipsoid
    lies strictly in front of the eye plane (a > 0 and B > 0); elsewhere —
    and for fisheye cameras — falls back to the conservative
    extent/z_near rect of :func:`project_footprints`.

    Lossless by construction: the march composites a hit only when
    alpha > alpha_min (shaders/tracer.cuh:361), and radius is the adaptive
    iso-surface radius where response*opacity = alpha_min
    (src/GaussianTracer.cpp:306), so rays outside the projected conic
    contribute exactly nothing.
    """
    from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat

    if config.camera_model == CameraModel.FISHEYE and config.exact_bbox:
        # fisheye tight path: exact hit-cone caps (anisotropy-aware)
        # through the exact polar-warp rectangle in project_footprints
        caps = fisheye_cone_caps(means, scales, quats, radius, camera)
        return project_footprints(means, bound_radius, camera, config,
                                  cone_caps=caps)
    extents = camera_axis_extents(scales, quats, radius, camera)
    fp = project_footprints(means, bound_radius, camera, config, extents=extents)
    if (
        config.camera_model not in (CameraModel.PINHOLE, CameraModel.OPENCV)
        or not config.exact_bbox
    ):
        return fp

    U, V, W = camera.uvw_frame()
    ulen = jnp.linalg.norm(U)
    vlen = jnp.linalg.norm(V)
    wlen = jnp.linalg.norm(W)
    u_p = -U / ulen  # raygen dir = ndc_x*(-U) + ndc_y*(-V) + W
    v_p = -V / vlen
    w_hat = W / wlen
    cu, cv = wlen / ulen, wlen / vlen

    rel = means - camera.eye
    B = rel @ w_hat
    Xu = rel @ (cu * u_p)
    Xv = rel @ (cv * v_p)

    R = quat_to_rotmat(quats)  # (N, 3, 3)

    def srt(axis):  # S R^T axis, (N, 3)
        return scales * jnp.einsum("nji,j->ni", R, axis)

    Pu = srt(cu * u_p)
    Pv = srt(cv * v_p)
    Q = srt(w_hat)
    r2 = radius * radius
    qq = jnp.sum(Q * Q, axis=-1)
    a = B * B - r2 * qq

    def interval(X, P):
        b = X * B - r2 * jnp.sum(P * Q, axis=-1)
        Vv = B[:, None] * P - X[:, None] * Q
        C = jnp.cross(P, Q)
        D = r2 * (jnp.sum(Vv * Vv, axis=-1) - r2 * jnp.sum(C * C, axis=-1))
        sq = jnp.sqrt(jnp.maximum(D, 0.0))
        a_safe = jnp.maximum(a, _EPS)
        return b / a_safe, sq / a_safe  # (ndc center, ndc half-extent)

    kcu, khu = interval(Xu, Pu)
    kcv, khv = interval(Xv, Pv)
    exact = (a > 0.0) & (B > 0.0)

    Wpx, Hpx = camera.width, camera.height
    if config.camera_model == CameraModel.OPENCV:
        # exact ideal-NDC interval mapped through the forward distortion
        px, py, rx, ry = _distort_rect_px(kcu, kcv, khu, khv, camera, config)
    else:
        px = (kcu + 1.0) * 0.5 * Wpx
        py = (kcv + 1.0) * 0.5 * Hpx
        rx = khu * 0.5 * Wpx + 1.0
        ry = khv * 0.5 * Hpx + 1.0
    return Footprint(
        px=jnp.where(exact, px, fp.px),
        py=jnp.where(exact, py, fp.py),
        rx=jnp.where(exact, rx, fp.rx),
        ry=jnp.where(exact, ry, fp.ry),
        depth=fp.depth,
        visible=fp.visible,
    )


def _cone_azimuth_interval(gf, q0x, q0y):
    """Exact azimuth interval of the quadratic cone d^T G_f d <= 0 in the
    frame basis (z = optical axis).

    A meridian half-plane at azimuth p contains cone directions iff the
    2x2 restriction of G_f to span{(cos p, sin p, 0), z} has a
    nonpositive eigenvalue; since G_f has exactly one negative eigenvalue
    no 2-plane is negative definite, so the condition is det <= 0, which
    condenses to q^T H q <= 0 for q = (cos p, sin p) with
        H = g33 * [[g11, g12], [g12, g22]] - [g13, g23][g13, g23]^T.
    H indefinite: the azimuth set is the +/-q sector pair bounded by H's
    null directions (closed form); the forward nappe's sector is the one
    containing the cap-axis azimuth q0. H nsd (or degenerate): all
    azimuths. Returns (e1x, e1y, e2x, e2y, az_wrap).
    """
    g11, g12, g13, g22, g23, g33 = gf
    alpha = g33 * g11 - g13 * g13
    beta = g33 * g12 - g13 * g23
    gamma = g33 * g22 - g23 * g23
    detH = alpha * gamma - beta * beta
    az_wrap = detH >= -1e-12 * jnp.maximum(alpha * alpha + gamma * gamma, 1e-30)
    sq = jnp.sqrt(jnp.maximum(beta * beta - alpha * gamma, 0.0))
    # null directions of q^T H q: gamma s^2 + 2 beta c s + alpha c^2 = 0.
    # Two algebraic forms, each ill-conditioned where its denominator
    # vanishes — build both roots from the stable pairing (q = (c, s)):
    #   s/c = (-beta ± sq)/gamma   <->   c/s = (-beta ∓ sq)/alpha
    big_g = jnp.abs(gamma) >= jnp.abs(alpha)
    e1x = jnp.where(big_g, gamma, -beta - sq)
    e1y = jnp.where(big_g, -beta + sq, alpha)
    e2x = jnp.where(big_g, gamma, -beta + sq)
    e2y = jnp.where(big_g, -beta - sq, alpha)

    def unit(x, y):
        n = jnp.sqrt(jnp.maximum(x * x + y * y, 1e-30))
        return x / n, y / n

    e1x, e1y = unit(e1x, e1y)
    e2x, e2y = unit(e2x, e2y)
    # orient the endpoints so the axis azimuth lies INSIDE the chosen
    # sector: solve q0 = a*e1 + b*e2 and flip each endpoint by its
    # coefficient's sign (a plain dot test can pick the wrong sign when
    # the sector half-width exceeds pi/2). Near-parallel endpoints
    # (det ~ 0) fall back to all-azimuth.
    det = e1x * e2y - e1y * e2x
    a_c = q0x * e2y - q0y * e2x  # a * det
    b_c = e1x * q0y - e1y * q0x  # b * det
    s1 = jnp.sign(a_c * det)
    s2 = jnp.sign(b_c * det)
    s1 = jnp.where(s1 == 0.0, 1.0, s1)
    s2 = jnp.where(s2 == 0.0, 1.0, s2)
    az_wrap = az_wrap | (jnp.abs(det) < 1e-6)
    e1x, e1y = e1x * s1, e1y * s1
    e2x, e2y = e2x * s2, e2y * s2
    # widen each endpoint ~2e-3 rad AWAY from the axis azimuth (f32
    # margin over the exact boundary; rotation linearized, |e| ~ 1)
    eps = 2e-3
    r1 = -jnp.sign(e1x * q0y - e1y * q0x) * eps
    r2 = -jnp.sign(e2x * q0y - e2y * q0x) * eps
    e1x, e1y = e1x - r1 * e1y, e1y + r1 * e1x
    e2x, e2y = e2x - r2 * e2y, e2y + r2 * e2x
    return e1x, e1y, e2x, e2y, az_wrap


def fisheye_cone_caps(means, scales, quats, radius, camera):
    """Exact hit-cone caps: per gaussian, the tightest (axis, half-angle)
    spherical cap containing every world direction d whose forward ray
    eye + t d (t > 0) meets the adaptive iso-ellipsoid.

    Those directions are one nappe of the exact quadratic cone
    d^T G d <= 0 with G = cq * Q - (Q o)(Q o)^T (Q = R S^-2 R^T,
    o = eye - mu, cq = o^T Q o - rad^2 — the same scalars the march's hit
    gate evaluates, shaders/tracer.cuh:187-214 / ops/response.py). G has
    signature (-,+,+) when the eye is outside; the cap axis is the
    negative-eigenvalue direction and tan(half-angle) =
    sqrt(-l0 / min(l1, l2)) — exact along the cone's widest principal
    plane. Replaces the bounding-SPHERE cap (radius * max(scales)), which
    over-covers anisotropic gaussians by the full axis ratio (measured
    -52% fisheye pairs at the 768^2/100k bench config).

    Returns (ax, ay, az, delta, inside): unit world-basis cap axis
    (sign-aligned toward the gaussian), cap half-angle (with a 2e-3 rad
    absolute margin dominating the f32 eigensolve error ~sqrt(eps)), and
    the eye-inside-iso-ellipsoid mask (all directions hit).
    """
    from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat

    R = quat_to_rotmat(quats)  # (N, 3, 3)
    inv_s2 = 1.0 / jnp.maximum(scales * scales, 1e-20)  # (N, 3)
    ox = camera.eye[0] - means[:, 0]
    oy = camera.eye[1] - means[:, 1]
    oz = camera.eye[2] - means[:, 2]

    # Q = R diag(1/s^2) R^T, 6 unique components as (N,) arrays
    def q_comp(i, j):
        return jnp.sum(R[:, i, :] * R[:, j, :] * inv_s2, axis=-1)

    q00, q01, q02 = q_comp(0, 0), q_comp(0, 1), q_comp(0, 2)
    q11, q12, q22 = q_comp(1, 1), q_comp(1, 2), q_comp(2, 2)
    wx = q00 * ox + q01 * oy + q02 * oz  # Q o
    wy = q01 * ox + q11 * oy + q12 * oz
    wz = q02 * ox + q12 * oy + q22 * oz
    cq = ox * wx + oy * wy + oz * wz - radius * radius
    inside = cq <= 0.0

    # G = cq Q - w w^T, normalized for f32-stable eigenvalues
    g00 = cq * q00 - wx * wx
    g01 = cq * q01 - wx * wy
    g02 = cq * q02 - wx * wz
    g11 = cq * q11 - wy * wy
    g12 = cq * q12 - wy * wz
    g22 = cq * q22 - wz * wz
    gmax = jnp.maximum(
        jnp.maximum(jnp.maximum(jnp.abs(g00), jnp.abs(g11)), jnp.abs(g22)),
        jnp.maximum(jnp.maximum(jnp.abs(g01), jnp.abs(g02)), jnp.abs(g12)),
    )
    gn = 1.0 / jnp.maximum(gmax, 1e-30)
    g00, g01, g02 = g00 * gn, g01 * gn, g02 * gn
    g11, g12, g22 = g11 * gn, g12 * gn, g22 * gn

    # symmetric 3x3 eigenvalues, trigonometric (Cardano) form
    q = (g00 + g11 + g22) * (1.0 / 3.0)
    p1 = g01 * g01 + g02 * g02 + g12 * g12
    d0, d1, d2 = g00 - q, g11 - q, g22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 * (1.0 / 6.0), 1e-30))
    ip = 1.0 / p
    b00, b11, b22 = d0 * ip, d1 * ip, d2 * ip
    b01, b02, b12 = g01 * ip, g02 * ip, g12 * ip
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    phi = jnp.arccos(jnp.clip(detb * 0.5, -1.0, 1.0)) * (1.0 / 3.0)
    lam2 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    lam1 = 3.0 * q - lam0 - lam2
    delta = jnp.arctan2(
        jnp.sqrt(jnp.maximum(-lam0, 0.0)),
        jnp.sqrt(jnp.maximum(jnp.minimum(lam1, lam2), 1e-30)),
    )
    delta = jnp.minimum(delta + 2e-3, 0.5 * jnp.pi)
    # near-grazing degeneracy (lam0 ~ lam1 ~ 0): the eigenvector is
    # ill-conditioned exactly where the cap approaches a hemisphere —
    # treat as inside (full cover) rather than risk a wrong axis
    inside = inside | (jnp.minimum(lam1, lam2) < 1e-6)

    # eigenvector of lam0: the largest cross product of rows of G - lam0 I
    r0 = (g00 - lam0, g01, g02)
    r1 = (g01, g11 - lam0, g12)
    r2 = (g02, g12, g22 - lam0)

    def cross(u, v):
        return (
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        )

    cands = [cross(r0, r1), cross(r0, r2), cross(r1, r2)]
    n2 = [cx * cx + cy * cy + cz * cz for cx, cy, cz in cands]
    best = jnp.argmax(jnp.stack(n2, axis=-1), axis=-1)
    pick = lambda k: jnp.where(
        best == 0, cands[0][k], jnp.where(best == 1, cands[1][k], cands[2][k])
    )
    vx, vy, vz = pick(0), pick(1), pick(2)
    vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-30))
    # sign: toward the gaussian (axis . (mu - eye) > 0)
    sgn = jnp.where(vx * ox + vy * oy + vz * oz > 0.0, -1.0, 1.0) / vn
    vx, vy, vz = vx * sgn, vy * sgn, vz * sgn

    # exact azimuth interval of the cone in the FRAME basis (the cap's
    # azimuth half-width over-covers the elliptical cone's narrow axis)
    U, V, W = camera.uvw_frame()
    e1 = -U / jnp.linalg.norm(U)
    e2 = -V / jnp.linalg.norm(V)
    e3 = W / jnp.linalg.norm(W)

    def gdot(u, w):  # u^T G w, G in normalized world components
        return (
            u[0] * (g00 * w[0] + g01 * w[1] + g02 * w[2])
            + u[1] * (g01 * w[0] + g11 * w[1] + g12 * w[2])
            + u[2] * (g02 * w[0] + g12 * w[1] + g22 * w[2])
        )

    gf = (gdot(e1, e1), gdot(e1, e2), gdot(e1, e3),
          gdot(e2, e2), gdot(e2, e3), gdot(e3, e3))
    q0x = vx * e1[0] + vy * e1[1] + vz * e1[2]
    q0y = vx * e2[0] + vy * e2[1] + vz * e2[2]
    az1x, az1y, az2x, az2y, az_wrap = _cone_azimuth_interval(gf, q0x, q0y)

    # --- ELLIPTICAL polar support (round-5; the circular delta_max bound
    # over-covered the narrow principal axis by the full anisotropy
    # ratio). The cone boundary is EXACTLY
    #   d(psi) ~ axis + tan(d_a) cos(psi) v_a + tan(d_b) sin(psi) v_b
    # (in G's eigenbasis the cone is -|l0| a^2 + l1 b^2 + l2 c^2 = 0), so
    #   cos theta(psi) = (ca + x(psi)) / sqrt(1 + |tan|^2(psi)),
    #   x(psi) = tan(d_a) cos(psi) (v_a.e3) + tan(d_b) sin(psi) (v_b.e3),
    # and x ranges over +-A with A = sqrt((tan(d_a) v_a.e3)^2 +
    # (tan(d_b) v_b.e3)^2) (exact support of the linear part); the
    # denominator lies in [1, 1/cos(delta)]. project_footprints turns
    # (ca, A, cos delta) into sound theta bounds. v_a is the lam1
    # eigenvector (same cross-product extraction as the axis), v_b =
    # axis x v_a (exact for symmetric G, and keeps {v_a, v_b}
    # orthonormal even when lam1 ~ lam2, where independent extraction
    # is ill-conditioned). A is clamped by the circular tan(delta),
    # which is always sound.
    ra0 = (g00 - lam1, g01, g02)
    ra1 = (g01, g11 - lam1, g12)
    ra2 = (g02, g12, g22 - lam1)
    cands_a = [cross(ra0, ra1), cross(ra0, ra2), cross(ra1, ra2)]
    na2 = [cx * cx + cy * cy + cz * cz for cx, cy, cz in cands_a]
    best_a = jnp.argmax(jnp.stack(na2, axis=-1), axis=-1)
    pick_a = lambda k: jnp.where(
        best_a == 0, cands_a[0][k],
        jnp.where(best_a == 1, cands_a[1][k], cands_a[2][k]),
    )
    vax, vay, vaz = pick_a(0), pick_a(1), pick_a(2)
    van = jnp.sqrt(jnp.maximum(vax * vax + vay * vay + vaz * vaz, 1e-30))
    vax, vay, vaz = vax / van, vay / van, vaz / van
    # v_b = axis x v_a
    vbx = vy * vaz - vz * vay
    vby = vz * vax - vx * vaz
    vbz = vx * vay - vy * vax
    ta = jnp.sqrt(jnp.maximum(-lam0, 0.0) / jnp.maximum(lam1, 1e-30))
    tb = jnp.sqrt(jnp.maximum(-lam0, 0.0) / jnp.maximum(lam2, 1e-30))
    va_e3 = vax * e3[0] + vay * e3[1] + vaz * e3[2]
    vb_e3 = vbx * e3[0] + vby * e3[1] + vbz * e3[2]
    tan_delta = jnp.tan(jnp.minimum(delta, 0.5 * jnp.pi - 1e-3))
    pol_sup = jnp.minimum(
        jnp.sqrt((ta * va_e3) ** 2 + (tb * vb_e3) ** 2) + 2e-3,
        tan_delta,
    )
    return (vx, vy, vz, delta, inside,
            az1x, az1y, az2x, az2y, az_wrap, pol_sup)


def project_footprints(
    means: jnp.ndarray,
    bound_radius: jnp.ndarray,
    camera: Camera,
    config: RenderConfig,
    extents: tuple | None = None,
    cone_caps: tuple | None = None,
) -> Footprint:
    """Conservative screen-space footprints.

    bound_radius: bounding-sphere radius (used by the fisheye model and as
    the fallback when `extents` is None).
    extents: optional (ru, rv, rw) tight per-camera-axis half-extents from
    camera_axis_extents (pinhole only).
    """
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

    if config.camera_model in (CameraModel.PINHOLE, CameraModel.OPENCV):
        # ndc_x = (a / c) * |W|/|U| (camera basis is orthogonal; raygen dir =
        # dx*(-U) + dy*(-V) + W, shaders/tracer.cuh:133)
        z = jnp.maximum(c, _EPS)
        ndc_x = a / z * (wlen / ulen)
        ndc_y = b / z * (wlen / vlen)
        px = (ndc_x + 1.0) * 0.5 * Wpx
        py = (ndc_y + 1.0) * 0.5 * Hpx
        ru, rv, rw = extents if extents is not None else (
            bound_radius, bound_radius, bound_radius
        )
        z_near = jnp.maximum(c - rw, _EPS)
        rx = ru / z_near * (wlen / ulen) * 0.5 * Wpx
        ry = rv / z_near * (wlen / vlen) * 0.5 * Hpx
        visible = (c + rw) > _EPS
        depth = c
        if config.camera_model == CameraModel.OPENCV:
            px, py, rx, ry = _distort_rect_px(
                ndc_x, ndc_y,
                rx / (0.5 * Wpx), ry / (0.5 * Hpx),
                camera, config,
            )
    elif config.camera_model == CameraModel.FISHEYE:
        # The raygen (cameras.generate_rays) builds the equisolid LOCAL
        # unit vector (sin t cos p, sin t sin p, cos t) and maps it through
        # the NON-orthonormal frame (-U, -V, W) (|U| = |V| ~ 0.58 |W| at
        # fovY 60): NDC radius therefore encodes the FRAME-NORMALIZED
        # angle, not the world angle. All footprint math runs on that
        # local sphere: l = (a/|U|, b/|V|, c/|W|) normalized. (Assuming
        # world angles under-covered by up to |W|/|V| and was the round-3
        # fisheye parity failure: interior holes, 22 dB at 720p.)
        rho = jnp.sqrt(jnp.sum(rel * rel, axis=-1))
        rho_safe = jnp.maximum(rho, _EPS)
        lx, ly, lz = a / ulen, b / vlen, c / wlen
        ln = jnp.sqrt(jnp.maximum(lx * lx + ly * ly + lz * lz, _EPS * _EPS))
        cos_t = jnp.clip(lz / ln, -1.0, 1.0)
        theta = jnp.arccos(cos_t)
        f = config.fisheye_focal
        r_ndc = 2.0 * f * jnp.sin(0.5 * theta)
        planar = jnp.sqrt(jnp.maximum(lx * lx + ly * ly, _EPS * _EPS))
        ndc_x = r_ndc * lx / planar
        ndc_y = r_ndc * ly / planar
        px = (ndc_x + 1.0) * 0.5 * Wpx
        py = (ndc_y + 1.0) * 0.5 * Hpx
        # EXACT local polar rectangle of the bounding sphere's image.
        # The raygen's local map is l = normalize(L d) with
        # L = diag(1/|U|, 1/|V|, 1/|W|) in the orthonormal frame basis.
        # Key structure (replaces the round-3 isotropic cap-stretch bound
        # delta_local <= delta_world * smax / (|L d0| - smax*chord), which
        # emitted ~2.2x pairs):
        #   - AZIMUTH: the map sends azimuth p to the direction of
        #     (cos p / |U|, sin p / |V|) INDEPENDENT of polar angle; with
        #     |U| = |V| azimuth is preserved EXACTLY, otherwise it is a
        #     monotone reparametrization — so the world cap's exact
        #     azimuth interval maps to the interval between its endpoint
        #     images.
        #   - POLAR: tan(theta') = k(p) * tan(theta) with
        #     k(p) = |W| * |(cos p / |U|, sin p / |V|)| in
        #     [k_lo, k_hi] = |W|/max(|U|,|V|) .. |W|/min(|U|,|V|), and
        #     atan2(k sin t, cos t) is monotone in t (any k) and in k
        #     (fixed t < pi/2; decreasing for t > pi/2) — so evaluating
        #     the warp at both k extremes bounds theta' exactly.
        # The world cap around rel_hat with angular radius
        # dw = arcsin(br/rho) lies in the world polar rectangle
        # [t0-dw, t0+dw] x [p0-dphi, p0+dphi], dphi = arcsin(sin dw/sin t0)
        # (all azimuths when sin t0 <= sin dw or the cap holds a pole).
        if cone_caps is not None:
            # exact hit-cone caps (fisheye_cone_caps): axis + half-angle
            # of the tightest cap over the forward hit directions, plus
            # the cone's EXACT frame-basis azimuth interval — replaces
            # the bounding-sphere cap below for anisotropic gaussians
            (cax, cay, caz, delta_w, inside,
             az1x, az1y, az2x, az2y, az_wrap, pol_sup) = cone_caps
            ca = cax * (-u_hat[0]) + cay * (-u_hat[1]) + caz * (-u_hat[2])
            cb = cax * (-v_hat[0]) + cay * (-v_hat[1]) + caz * (-v_hat[2])
            cc_ax = cax * w_hat[0] + cay * w_hat[1] + caz * w_hat[2]
        else:
            az_wrap = None
            pol_sup = None
            delta_w = jnp.arcsin(jnp.clip(bound_radius / rho_safe, 0.0, 1.0))
            inside = rho <= bound_radius
            ca, cb, cc_ax = a / rho_safe, b / rho_safe, c / rho_safe

        # world polar coordinates of the cap center (frame basis)
        cos_t0w = jnp.clip(cc_ax, -1.0, 1.0)
        sin_t0w = jnp.sqrt(jnp.maximum(1.0 - cos_t0w * cos_t0w, 0.0))
        t0w = jnp.arccos(cos_t0w)
        sin_dw = jnp.sin(jnp.minimum(delta_w, 0.5 * jnp.pi))
        wrap = (delta_w >= t0w) | (sin_t0w <= sin_dw)
        t_lo_w = jnp.where(wrap, 0.0, jnp.maximum(t0w - delta_w, 0.0))
        t_hi_w = jnp.minimum(t0w + delta_w, jnp.pi)
        if pol_sup is not None:
            # ELLIPTICAL polar extents (round-5; ROADMAP item 3): the
            # circular bound above spends the cone's WIDEST half-angle in
            # every azimuth. With the exact boundary parametrization (see
            # fisheye_cone_caps), cos theta over the cone lies in
            # [num_min, num_max] / denom with num = cc_ax +- pol_sup and
            # denom in [1, 1/cos delta]:
            #   lower bound: num_min * cos(delta) when num_min >= 0
            #                (largest denominator), else num_min;
            #   upper bound: num_max when num_max >= 0, else
            #                num_max * cos(delta).
            # Both are sound for every azimuth; intersect with the
            # circular rectangle (also sound) and keep the circular wrap
            # handling (pole-containing caps).
            cos_dw_c = jnp.cos(jnp.minimum(delta_w, 0.5 * jnp.pi))
            num_min = cc_ax - pol_sup
            num_max = cc_ax + pol_sup
            cos_min = jnp.clip(
                jnp.where(num_min >= 0.0, num_min * cos_dw_c, num_min),
                -1.0, 1.0,
            )
            cos_max = jnp.clip(
                jnp.where(num_max >= 0.0, num_max, num_max * cos_dw_c),
                -1.0, 1.0,
            )
            t_lo_w = jnp.where(
                wrap, t_lo_w, jnp.maximum(t_lo_w, jnp.arccos(cos_max))
            )
            t_hi_w = jnp.where(
                wrap, t_hi_w, jnp.minimum(t_hi_w, jnp.arccos(cos_min))
            )

        # exact azimuth interval: world endpoints through the (monotone)
        # azimuth map p -> dir(su cos p, sv sin p), all angle-addition —
        # no trig calls. (Computed BEFORE the polar warp: the warp's
        # anisotropy factor k(p) is restricted to this interval below.)
        su, sv, sw = 1.0 / ulen, 1.0 / vlen, 1.0 / wlen
        if az_wrap is not None:
            # exact elliptical-cone azimuth endpoints (frame basis)
            c1w, s1w, c2w, s2w = az1x, az1y, az2x, az2y
            awrap = az_wrap
        else:
            # cap-based azimuth interval (conservative)
            cos_dphi_w = jnp.where(
                wrap, -1.0,
                jnp.sqrt(jnp.clip(
                    1.0 - (sin_dw / jnp.maximum(sin_t0w, _EPS)) ** 2, 0.0, 1.0
                )),
            )
            sin_dphi_w = jnp.sqrt(
                jnp.maximum(1.0 - cos_dphi_w * cos_dphi_w, 0.0)
            )
            planar_w = jnp.sqrt(jnp.maximum(ca * ca + cb * cb, _EPS * _EPS))
            cphi0 = ca / planar_w
            sphi0 = cb / planar_w
            c1w = cphi0 * cos_dphi_w + sphi0 * sin_dphi_w  # cos(p0 - dphi)
            s1w = sphi0 * cos_dphi_w - cphi0 * sin_dphi_w
            c2w = cphi0 * cos_dphi_w - sphi0 * sin_dphi_w  # cos(p0 + dphi)
            s2w = sphi0 * cos_dphi_w + cphi0 * sin_dphi_w
            awrap = wrap

        # polar warp. k(p) = sqrt(su^2 cos^2 p + sv^2 sin^2 p)/sw is
        # monotone in cos^2 p, so over the gaussian's AZIMUTH INTERVAL the
        # factor ranges over [k(c2_ext), k(c2_min..max)] — far narrower
        # than the global [min(su,sv), max(su,sv)]/sw whenever the
        # interval avoids the frame axes (round-5; the global extremes
        # over-warped every off-axis gaussian's polar rectangle).
        # cos^2 p extremes over the interval: the endpoints', widened to
        # 1 when the interval contains azimuth 0 or pi and to 0 when it
        # contains +-pi/2 (midpoint/half-width membership test; wrap ->
        # full range).
        mxw = c1w + c2w
        myw = s1w + s2w
        mnw = jnp.sqrt(jnp.maximum(mxw * mxw + myw * myw, _EPS * _EPS))
        degen_w = (mxw * mxw + myw * myw) < 1e-8
        cphi_w = mxw / mnw
        sphi_w = myw / mnw
        coshw = jnp.clip(cphi_w * c1w + sphi_w * s1w, -1.0, 1.0)
        full_k = awrap | degen_w
        c2_1 = c1w * c1w
        c2_2 = c2w * c2w
        c2_min = jnp.minimum(c2_1, c2_2)
        c2_max = jnp.maximum(c2_1, c2_2)
        # contains p=0 or p=pi -> cos^2 reaches 1; contains +-pi/2 -> 0
        c2_max = jnp.where(
            full_k | (cphi_w >= coshw) | (-cphi_w >= coshw), 1.0, c2_max
        )
        c2_min = jnp.where(
            full_k | (sphi_w >= coshw) | (-sphi_w >= coshw), 0.0, c2_min
        )
        k_of = lambda c2: jnp.sqrt(
            sv * sv + (su * su - sv * sv) * c2
        ) / sw
        ka, kb = k_of(c2_min), k_of(c2_max)
        k_lo = jnp.minimum(ka, kb)
        k_hi = jnp.maximum(ka, kb)
        warp_t = lambda t, k: jnp.arctan2(k * jnp.sin(t), jnp.cos(t))
        theta_lo = jnp.minimum(warp_t(t_lo_w, k_lo), warp_t(t_lo_w, k_hi))
        theta_lo = jnp.where(wrap, 0.0, jnp.maximum(theta_lo, 0.0))
        # rays only exist for theta' <= pi/2 (r <= 1, tracer.cuh:155-159):
        # clip to the hemisphere — a large cut for side gaussians
        theta_hi = jnp.maximum(warp_t(t_hi_w, k_lo), warp_t(t_hi_w, k_hi))
        theta_hi = jnp.clip(theta_hi, 0.0, 0.5 * jnp.pi + 0.02)
        r_hi = 2.0 * f * jnp.sin(0.5 * theta_hi)
        r_lo = 2.0 * f * jnp.sin(0.5 * theta_lo)

        def _img_az(cw, sw_):
            x, y = su * cw, sv * sw_
            nrm = jnp.sqrt(jnp.maximum(x * x + y * y, _EPS * _EPS))
            return x / nrm, y / nrm

        c1, s1 = _img_az(c1w, s1w)
        c2, s2 = _img_az(c2w, s2w)
        # image center azimuth + half-width: angular midpoint of the
        # endpoint images (the interval is < pi wide whenever not wrap);
        # a degenerate midpoint falls back to all-azimuth (conservative)
        mx, my = c1 + c2, s1 + s2
        mn = jnp.sqrt(jnp.maximum(mx * mx + my * my, _EPS * _EPS))
        degen = (mx * mx + my * my) < 1e-8
        cphi = jnp.where(degen, lx / planar, mx / mn)
        sphi = jnp.where(degen, ly / planar, my / mn)
        cos_dphi = jnp.where(
            awrap | degen, -1.0,
            jnp.clip(cphi * c1 + sphi * s1, -1.0, 1.0),
        )
        sin_dphi = jnp.sqrt(jnp.maximum(1.0 - cos_dphi * cos_dphi, 0.0))
        # contains angle alpha <=> cos(phi0 - alpha) >= cos(dphi)
        has_xp = cphi >= cos_dphi    # phi = 0     -> x reaches +r_hi
        has_xm = -cphi >= cos_dphi   # phi = pi    -> x reaches -r_hi
        has_yp = sphi >= cos_dphi    # phi = pi/2  -> y reaches +r_hi
        has_ym = -sphi >= cos_dphi   # phi = -pi/2 -> y reaches -r_hi
        big = jnp.float32(4.0)

        def _extent(cc1, cc2, has_p, has_m):
            cands_max = jnp.maximum(
                jnp.maximum(r_lo * cc1, r_hi * cc1),
                jnp.maximum(r_lo * cc2, r_hi * cc2),
            )
            cands_max = jnp.where(has_p, jnp.maximum(cands_max, r_hi), cands_max)
            cands_min = jnp.minimum(
                jnp.minimum(r_lo * cc1, r_hi * cc1),
                jnp.minimum(r_lo * cc2, r_hi * cc2),
            )
            cands_min = jnp.where(has_m, jnp.minimum(cands_min, -r_hi), cands_min)
            return cands_min, cands_max

        x_min, x_max = _extent(c1, c2, has_xp, has_xm)
        y_min, y_max = _extent(s1, s2, has_yp, has_ym)
        x_min = jnp.where(inside, -big, x_min)
        x_max = jnp.where(inside, big, x_max)
        y_min = jnp.where(inside, -big, y_min)
        y_max = jnp.where(inside, big, y_max)
        px = (0.5 * (x_min + x_max) + 1.0) * 0.5 * Wpx
        py = (0.5 * (y_min + y_max) + 1.0) * 0.5 * Hpx
        rx = 0.5 * (x_max - x_min) * 0.5 * Wpx
        ry = 0.5 * (y_max - y_min) * 0.5 * Hpx
        # visible hemisphere: r <= 1 <=> theta' <= pi/2 (tracer.cuh:155-159);
        # theta_lo is the warped lower polar bound (pre-clip it never
        # exceeds pi), so the cap is visible iff it is not wholly behind;
        # inside-gaussians (degenerate axis) are always visible
        visible = (theta_lo <= (0.5 * jnp.pi + 0.05)) | inside
        depth = rho
        # the annular sector the bbox came from (NDC around the optical
        # center), for the expansion-time sector cull. inside-gaussians
        # (full cover) and wrapped caps keep cos_dphi = -1 (azimuth cull
        # off) and the full radial range.
        sector = (
            cphi, sphi,
            jnp.where(inside, -1.0, cos_dphi),
            jnp.where(inside, 0.0, r_lo),
            jnp.where(inside, big, r_hi),
        )
    else:
        raise ValueError(config.camera_model)

    rx = rx * _MARGIN + 1.0
    ry = ry * _MARGIN + 1.0
    visible = visible & (bound_radius > 0.0)
    return Footprint(
        px, py, rx, ry, depth, visible,
        sector=(sector if config.camera_model == CameraModel.FISHEYE
                else None),
    )


def _depth_bits(n_tiles: int) -> tuple[int, int]:
    """(tile_bits, depth_bits) splitting a non-negative int32 sort key."""
    tile_bits = max(1, math.ceil(math.log2(n_tiles + 2)))
    if tile_bits > 24:
        raise ValueError(f"too many tiles for packed binning: {n_tiles}")
    return tile_bits, 31 - tile_bits


def _quantize_depth(depth: jnp.ndarray, depth_bits: int) -> jnp.ndarray:
    """Monotone uint quantization of positive float depth.

    The IEEE-754 bit pattern of a positive float is order-isomorphic to the
    float itself, so taking its top bits is a monotone quantizer across the
    full dynamic range (no scene-scale normalization needed).
    """
    d = jnp.clip(depth, 1e-30, 1e30)
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)  # positive => >= 0
    return jax.lax.shift_right_logical(bits, 31 - depth_bits)


def affine_tile_keys(
    means: jnp.ndarray,
    M9: jnp.ndarray,  # (N, 9) rows of M = S^-1 R^T
    fp: Footprint,
    camera: Camera,
    config: RenderConfig,
    depth_bits: int,
):
    """Per-gaussian AFFINE model of the per-tile depth key, quantized for
    gather-free pair binning (pair_keys="affine").

    The reference's anyhit k-buffer orders hits by each ray's own event t
    (shaders/tracer.cu:124-153). A single per-gaussian key (the
    sorted-splatting approximation) misorders gaussians whose t varies
    across the screen; per-pair keys along each tile's central ray recover
    most of the exact order but need a per-pair gather. This middle path is
    gather-free: the peak-response t along the ray through pixel p,
    t*(p) = -<o_g, M d(p)> / |M d(p)|^2, is smooth in p, so within one
    gaussian's footprint log t*(p) is well approximated by its first-order
    expansion. The model (value at the footprint's corner tile + per-tile
    slopes) is quantized to integers and carried onto the pair stream by
    two extra head-fills; each pair reconstitutes its own tile's key with
    two integer multiply-adds.

    Key order is only ever compared WITHIN a tile, so any per-tile monotone
    transform of t is admissible: log-space quantization gives uniform
    RELATIVE resolution (~2^depth_bits steps over t in [1e-4, 1e6]).

    Returns (a_q, bc_q): int32 (N,) model value at the corner tile and the
    packed per-tile-step slopes ((b+_SLOPE_OFF) << 13 | (c+_SLOPE_OFF)).
    Gaussians where the model is invalid (behind the eye, non-pinhole
    camera) fall back to the constant fp.depth key with zero slopes.
    """
    lmin, lmax = _LOGT_RANGE
    # quantize at <= _QBITS bits even when more depth bits are available:
    # slopes are stored in 13 signed bits, so the value scale bounds the
    # largest representable slope (+-4095/scale nats per tile step). At 16
    # bits the resolution is ~3.5e-4 relative t and slopes cover +-1.4
    # nats/tile -- both far outside the regime that affects ordering.
    qbits = min(depth_bits, _QBITS)
    scale = ((1 << qbits) - 2) / (lmax - lmin)

    # constant fallback key from fp.depth
    l_const = jnp.log(jnp.clip(fp.depth, 1e-30, 1e30))
    a_const = jnp.clip(
        (l_const - lmin) * scale, 0.0, float((1 << qbits) - 2)
    ).astype(jnp.int32)

    if config.camera_model != CameraModel.PINHOLE:
        zeros = jnp.full(means.shape[0], _SLOPE_OFF << 13 | _SLOPE_OFF, jnp.int32)
        return a_const, zeros

    U, V, W = camera.uvw_frame()
    Wpx, Hpx = camera.width, camera.height
    eye = jnp.asarray(camera.eye, jnp.float32)

    # ray through the footprint-center pixel (the point where the model is
    # most accurate for the tiles this gaussian actually covers)
    px = jnp.clip(fp.px, 0.0, Wpx)
    py = jnp.clip(fp.py, 0.0, Hpx)
    ndc_x = 2.0 * px / Wpx - 1.0
    ndc_y = 2.0 * py / Hpx - 1.0
    m = [M9[:, k] for k in range(9)]
    rel = eye - means  # o - mu
    ogx = m[0] * rel[:, 0] + m[1] * rel[:, 1] + m[2] * rel[:, 2]
    ogy = m[3] * rel[:, 0] + m[4] * rel[:, 1] + m[5] * rel[:, 2]
    ogz = m[6] * rel[:, 0] + m[7] * rel[:, 1] + m[8] * rel[:, 2]

    def mdot(v):  # (3,) world vector -> per-gaussian canonical components
        return (
            m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
            m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
            m[6] * v[0] + m[7] * v[1] + m[8] * v[2],
        )

    d = ndc_x[:, None] * (-U)[None, :] + ndc_y[:, None] * (-V)[None, :] + W[None, :]
    dgx, dgy, dgz = mdot((d[:, 0], d[:, 1], d[:, 2]))
    dd = dgx * dgx + dgy * dgy + dgz * dgz
    od = ogx * dgx + ogy * dgy + ogz * dgz
    dd_s = jnp.maximum(dd, 1e-12)
    t_star = -od / dd_s
    # keys must share units ACROSS gaussians within a tile, but each model
    # is anchored at its own pixel whose unnormalized |d| varies ~30% over
    # the FOV: use world-space depth t* |d| (and differentiate that)
    dw = jnp.sum(d * d, axis=-1)  # |d|^2 (world)
    dw_s = jnp.maximum(dw, 1e-12)
    t_world = t_star * jnp.sqrt(dw_s)

    # d/dpx, d/dpy of the ray direction are constant vectors
    du = (2.0 / Wpx) * (-U)
    dv = (2.0 / Hpx) * (-V)

    def dlog_dt(dvec):
        gx_, gy_, gz_ = mdot(dvec)
        od_p = ogx * gx_ + ogy * gy_ + ogz * gz_
        dd_p = 2.0 * (dgx * gx_ + dgy * gy_ + dgz * gz_)
        t_p = -(od_p * dd - od * dd_p) / (dd_s * dd_s)
        # log t_world = log t* + (1/2) log(d.d)
        return t_p / jnp.maximum(t_star, 1e-12) + (d @ dvec) / dw_s

    gpx = dlog_dt(du) * config.tile_w  # per-tile-step slope in log t
    gpy = dlog_dt(dv) * config.tile_h

    valid = (t_star > 1e-6) & (dd > 1e-12) & jnp.isfinite(gpx) & jnp.isfinite(gpy)

    l0 = jnp.log(jnp.clip(t_world, 1e-30, 1e30))
    # shift the expansion point to the CENTER of the corner tile (x0, y0):
    # callers add b*(tx - x0) + c*(ty - y0)
    x0t = px / config.tile_w  # footprint center in tile units
    y0t = py / config.tile_h
    b = jnp.clip(jnp.round(gpx * scale), -_SLOPE_MAX, _SLOPE_MAX)
    c = jnp.clip(jnp.round(gpy * scale), -_SLOPE_MAX, _SLOPE_MAX)
    # corner-tile value at the same clipped (x0, y0) corner _tile_rects
    # emits; the per-pair clip to [0, 2^db-2] happens after the slope terms
    # are added, so a_q may exceed the depth range here
    tw_, th_ = config.tile_w, config.tile_h
    tx_n, ty_n = num_tiles(camera, config)
    fx0 = jnp.floor(jnp.clip((fp.px - fp.rx) / tw_, -2.0, tx_n + 1.0))
    fy0 = jnp.floor(jnp.clip((fp.py - fp.ry) / th_, -2.0, ty_n + 1.0))
    x0 = jnp.clip(fx0, 0.0, tx_n - 1.0)
    y0 = jnp.clip(fy0, 0.0, ty_n - 1.0)
    a = (l0 - lmin) * scale + b * (x0 + 0.5 - x0t) + c * (y0 + 0.5 - y0t)
    a_q = jnp.clip(jnp.round(a), -(1 << 29), 1 << 29).astype(jnp.int32)

    a_q = jnp.where(valid, a_q, a_const)
    bc_q = jnp.where(
        valid,
        jax.lax.shift_left(b.astype(jnp.int32) + _SLOPE_OFF, 13)
        | (c.astype(jnp.int32) + _SLOPE_OFF),
        _SLOPE_OFF << 13 | _SLOPE_OFF,
    )
    return a_q, bc_q


_LOGT_RANGE = (math.log(1e-4), math.log(1e6))
_QBITS = 16  # value-quantization bits of the affine key model
_SLOPE_MAX = 4095
_SLOPE_OFF = 4096


def _tile_rects(fp: Footprint, camera: Camera, config: RenderConfig,
                tile_rows=None):
    """Clipped tile-rect bounds + per-gaussian pair counts (shared by both
    expansion paths).

    tile_rows: optional (row_lo, n_rows) restricting the expansion to the
    tile-row band [row_lo, row_lo + n_rows) — the per-SHARD binning used by
    the ray-DP renderers (each device bins only its own band, so binning
    cost scales 1/n_dev). row_lo may be traced (jax.lax.axis_index); the
    returned y0 is BAND-LOCAL. With tile_rows=None, behavior is the full
    grid as before."""
    tw, th = config.tile_w, config.tile_h
    tx_n, ty_n = num_tiles(camera, config)
    if tile_rows is None:
        row_lo, row_hi = 0, ty_n
    else:
        row_lo = tile_rows[0]
        row_hi = row_lo + tile_rows[1]
    # float-clip tile bounds before the int cast (projected centers of
    # near/behind-camera gaussians can be astronomically large)
    fclip = lambda v, n_t: jnp.clip(v, -2.0, n_t + 1.0)
    fx0 = jnp.floor(fclip((fp.px - fp.rx) / tw, tx_n)).astype(jnp.int32)
    fx1 = jnp.floor(fclip((fp.px + fp.rx) / tw, tx_n)).astype(jnp.int32)
    fy0 = jnp.floor(fclip((fp.py - fp.ry) / th, ty_n)).astype(jnp.int32)
    fy1 = jnp.floor(fclip((fp.py + fp.ry) / th, ty_n)).astype(jnp.int32)
    on = (
        (fx1 >= 0) & (fy1 >= row_lo) & (fx0 < tx_n) & (fy0 < row_hi)
        & fp.visible
    )
    x0 = jnp.clip(fx0, 0, tx_n - 1)
    x1 = jnp.clip(fx1, 0, tx_n - 1)
    y0 = jnp.clip(fy0, row_lo, row_hi - 1) - row_lo  # band-local row
    y1 = jnp.clip(fy1, row_lo, row_hi - 1) - row_lo
    sw = x1 - x0 + 1
    sh = y1 - y0 + 1
    count = jnp.where(on, sw * sh, 0)  # (N,)
    return x0, y0, sw, count


def projection_conics(geom: tuple, camera: Camera):
    """Per-gaussian homogeneous quadratic G of the exact hit conic in NDC.

    With the unit-sphere canonical map Mt = (S^-1 R^T)/radius (the iso
    surface where response*opacity = alpha_min maps to |x| = 1), a primary
    ray of NDC coords k = (kx, ky) has direction d(k) = kx*(-U) + ky*(-V)
    + W (cameras.generate_rays), and the LINE through the eye hits the iso
    ellipsoid iff

        q(k) = (o.d~)^2 - (|o|^2 - 1)|d~|^2 >= 0,   d~ = Mt d(k),
               o = Mt (eye - mu)

    which is a quadratic form q(k) = khat^T G khat in khat = (kx, ky, 1):
    exactly the march kernel's disc >= 0 gate (ops/pallas_march.py), i.e.
    exactly `max response along the ray > alpha_min` (tracer.cuh:187-214 +
    the :361 alpha_min cutoff). G is valid for every gaussian (eye inside
    the ellipsoid makes q > 0 everywhere — nothing is ever culled).

    Returns six (N,) float32 columns (g00, g01, g11, g02, g12, g22),
    normalized per-gaussian to unit max-abs for f32 headroom.
    """
    means, M9, radius = geom
    eye = camera.eye
    U, V, W = camera.uvw_frame()
    rs = 1.0 / jnp.maximum(radius, 1e-12)
    Mt = M9 * rs[:, None]  # (N, 9) rows of (S^-1 R^T)/radius

    def mdot(vx, vy, vz):
        return (
            Mt[:, 0] * vx + Mt[:, 1] * vy + Mt[:, 2] * vz,
            Mt[:, 3] * vx + Mt[:, 4] * vy + Mt[:, 5] * vz,
            Mt[:, 6] * vx + Mt[:, 7] * vy + Mt[:, 8] * vz,
        )

    o1, o2, o3 = mdot(
        eye[0] - means[:, 0], eye[1] - means[:, 1], eye[2] - means[:, 2]
    )
    au = mdot(-U[0], -U[1], -U[2])
    av = mdot(-V[0], -V[1], -V[2])
    aw = mdot(W[0], W[1], W[2])
    lam = o1 * o1 + o2 * o2 + o3 * o3 - 1.0
    dot = lambda a, b: a[0] * b[0] + a[1] * b[1] + a[2] * b[2]
    o = (o1, o2, o3)
    s_u, s_v, s_w = dot(au, o), dot(av, o), dot(aw, o)
    g00 = s_u * s_u - lam * dot(au, au)
    g01 = s_u * s_v - lam * dot(au, av)
    g11 = s_v * s_v - lam * dot(av, av)
    g02 = s_u * s_w - lam * dot(au, aw)
    g12 = s_v * s_w - lam * dot(av, aw)
    g22 = s_w * s_w - lam * dot(aw, aw)
    gmax = functools.reduce(
        jnp.maximum, [jnp.abs(g) for g in (g00, g01, g11, g02, g12, g22)]
    )
    sc = 1.0 / jnp.maximum(gmax, 1e-30)
    return tuple(g * sc for g in (g00, g01, g11, g02, g12, g22))


def _conic_rect_cull(gc, kx0, kx1, ky0, ky1):
    """True where the pair is PROVABLY dead: max of q over the NDC rect
    [kx0,kx1]x[ky0,ky1] < 0 (no ray through the tile can clear alpha_min).

    The max of a 2D quadratic over a box is attained at a corner, an edge
    critical point, or the interior critical point; every candidate below
    is clamped into the rect, so the running max never exceeds the true
    max (sound), and the candidate set contains every possible argmax
    (complete). NaNs keep the pair (comparisons with NaN are False)."""
    g00, g01, g11, g02, g12, g22 = gc

    def q(x, y):
        return (
            (g00 * x + 2.0 * g01 * y + 2.0 * g02) * x
            + (g11 * y + 2.0 * g12) * y
            + g22
        )

    m = q(kx0, ky0)
    m = jnp.maximum(m, q(kx0, ky1))
    m = jnp.maximum(m, q(kx1, ky0))
    m = jnp.maximum(m, q(kx1, ky1))
    # edge criticals (denominator forced negative: a convex edge direction
    # lands on an endpoint after the clamp, which corners already cover)
    den_y = jnp.minimum(g11, -1e-30)
    for x in (kx0, kx1):
        ys = jnp.clip(-(g01 * x + g12) / den_y, ky0, ky1)
        m = jnp.maximum(m, q(x, ys))
    den_x = jnp.minimum(g00, -1e-30)
    for y in (ky0, ky1):
        xs = jnp.clip(-(g01 * y + g02) / den_x, kx0, kx1)
        m = jnp.maximum(m, q(xs, y))
    # interior critical point (grad q = 0), clamped into the rect
    det = g00 * g11 - g01 * g01
    det_s = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    xi = jnp.clip((g01 * g12 - g11 * g02) / det_s, kx0, kx1)
    yi = jnp.clip((g01 * g02 - g00 * g12) / det_s, ky0, ky1)
    m = jnp.maximum(m, q(xi, yi))
    # margin absorbs f32 rounding of the normalized form (|g| <= 1)
    return m < -1e-5


def count_pairs(scene, camera: Camera, config: RenderConfig) -> jnp.ndarray:
    """Exact (tile, gaussian) pair count of a frame WITHOUT expanding the
    stream — O(N) footprint math only. Lets callers pick a snug
    pair_capacity bucket up front (sort/gather cost scales with capacity)
    instead of over-provisioning."""
    from gaussian_ray_tracing_tpu.ops.response import adaptive_radius

    radius = adaptive_radius(scene.opacities, config.alpha_min)
    bound_radius = radius * jnp.max(scene.scales, axis=-1)
    fp = project_footprints_conic(
        scene.means, scene.scales, scene.quats, radius, bound_radius,
        camera, config,
    )
    _, _, _, count = _tile_rects(fp, camera, config)
    return jnp.sum(count)


def _head_fill(first: jnp.ndarray, values: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Broadcast per-gaussian int32 `values` onto the pair stream: scatter
    the VALUE DELTAS at each gaussian's first slot, then cumsum. Zero-count
    gaussians share their successor's head slot; the scatter-ADD telescopes
    their deltas, so every slot's prefix sum is exactly its owner's value.
    O(N) scatter + O(P) scan — replaces a P-row gather (which costs ~5x
    more: row gathers are row-count-bound, P >> N)."""
    delta = values - jnp.concatenate([jnp.zeros((1,), values.dtype), values[:-1]])
    buf = jnp.zeros((cap + 1,), jnp.int32).at[first].add(delta)
    return jnp.cumsum(buf[:cap])


def _bin_pairs_presorted(
    fp: Footprint, camera: Camera, config: RenderConfig, cap: int,
    tile_rows=None, conics=None, spans=None, sector=None,
) -> PairStream:
    """Gather-free pair expansion over DEPTH-SORTED gaussians.

    The gaussians are argsorted by depth key first (an N-sized sort, ~5%
    of a P-sized one), so pairs are emitted in global front-to-back order
    and the final sort is a STABLE tile-only sort — no quantized depth in
    the key (exact 31-bit depth order, better than the 19-bit quantized
    keys of the general path) and no (P, 5) per-pair info gather: all
    per-pair context arrives through O(N)-scatter + O(P)-cumsum head
    fills (_head_fill).

    gid is returned in RANK space with the permutation in `order`:
    consumers index reordered tables (table[order]).

    tile_rows: optional (row_lo, n_rows) per-shard band restriction (see
    _tile_rects); tile ids and `starts` are then band-local.

    conics: optional per-gaussian projected-conic columns
    (projection_conics): each expanded pair is tested against its tile's
    exact NDC rect and provably-dead pairs (bbox corners outside the hit
    conic) are dropped from the stream before the tile sort — the march
    then skips them entirely. The six float columns ride the same fused
    head fill as the int context (bitcast to int32: delta + cumsum is
    exact integer arithmetic, so the float bits round-trip exactly).
    """
    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * (ty_n if tile_rows is None else tile_rows[1])
    n = fp.px.shape[0]

    x0, y0, sw, count = _tile_rects(fp, camera, config, tile_rows=tile_rows)

    bx = max(1, (tx_n - 1).bit_length())
    by = max(1, (ty_n - 1).bit_length())
    bsw = max(1, tx_n.bit_length())  # sw can equal tx_n
    if bx + by + bsw > 31:
        raise ValueError(f"tile grid too large to pack: {tx_n}x{ty_n}")

    bsh = max(1, ty_n.bit_length())  # sh can equal ty_n
    span_chans = None
    if spans is not None and 2 * bsw + bsh <= 31:
        # 3-zone expansion (_edge_row_spans): the top/bottom rows emit only
        # their exact conic x-span, middles the full width. count shrinks
        # accordingly, so every O(P) stage downstream (fills, tile sort,
        # feature gather, march) shrinks with it.
        d0, w0, d1, w1 = spans
        sw1 = jnp.maximum(sw, 1)
        sh = jnp.floor(
            count.astype(jnp.float32) / sw1.astype(jnp.float32)
        ).astype(jnp.int32)
        count = jnp.where(
            count > 0,
            w0 + jnp.maximum(sh - 2, 0) * sw1
            + jnp.where(sh >= 2, w1, 0),
            0,
        )
        span_chans = (
            jax.lax.shift_left(d0, bsw) | w0,
            jax.lax.shift_left(d1, bsw + bsh)
            | jax.lax.shift_left(w1, bsh)
            | sh,
        )

    # --- depth pre-sort (N) -------------------------------------------
    d = jnp.clip(fp.depth, 1e-30, 1e30)
    dbits = jax.lax.bitcast_convert_type(d, jnp.int32)  # monotone, >= 0
    _, order = jax.lax.sort_key_val(dbits, jnp.arange(n, dtype=jnp.int32))
    x0 = x0[order]
    y0 = y0[order]
    sw = jnp.maximum(sw[order], 1)
    count = count[order]
    if span_chans is not None:
        span_chans = tuple(ch[order] for ch in span_chans)

    offsets = jnp.cumsum(count) - count  # exclusive
    total = offsets[-1] + count[-1] if n else jnp.int32(0)
    first = jnp.minimum(offsets, cap)

    # --- per-pair context: fused multi-channel head fill ----------------
    # (ops/scan.multi_head_fill: C 1-D delta scatters + ONE fused Pallas
    # scan; the owner-rank fill is a delta fill too, ranks increase along
    # the stream. A (P, k) context gather was tried and measured
    # CATASTROPHIC — see multi_head_fill's docstring.)
    from gaussian_ray_tracing_tpu.ops.scan import multi_head_fill

    ranks = jnp.arange(n, dtype=jnp.int32)
    packedv = jax.lax.shift_left(x0, by + bsw) | jax.lax.shift_left(y0, bsw) | sw
    # rank + offset share ONE channel when they fit int31: the within-
    # gaussian pair index r = slot - offsets[owner] is < count <= n_tiles,
    # so only the low n_tiles.bit_length() offset bits matter (the
    # subtraction is exact mod 2^b_off). Deltas of the packed value
    # telescope exactly through the scatter+cumsum (integer sums), so the
    # fill reconstructs the packed value bit-for-bit. One fewer 1-D
    # scatter (~0.8 ms at the bench config, PERF.md scatter-rate law).
    rank_bits_n = max(1, n.bit_length())  # ranks + 1 <= n
    b_off = max(1, n_tiles.bit_length())  # r < count <= n_tiles
    pack_off = rank_bits_n + b_off <= 31
    if pack_off:
        off_mask = (1 << b_off) - 1
        fill_vals = [
            jax.lax.shift_left(ranks + 1, b_off) | (offsets & off_mask),
            packedv,
        ]
    else:
        fill_vals = [ranks + 1, offsets, packedv]
    base = len(fill_vals)
    n_span = 0
    if span_chans is not None:
        fill_vals += list(span_chans)
        n_span = 2
    if conics is not None:
        bc = jax.lax.bitcast_convert_type
        fill_vals += [bc(g[order], jnp.int32) for g in conics]
    base_sector = len(fill_vals)
    if sector is not None:
        bc = jax.lax.bitcast_convert_type
        fill_vals += [bc(v[order], jnp.int32) for v in sector]
    filled = multi_head_fill(first, fill_vals, cap)
    slot = jnp.arange(cap, dtype=jnp.int32)
    if pack_off:
        ch0, packed = filled[0], filled[1]
        rank_f = jax.lax.shift_right_logical(ch0, b_off)
        r = (slot - (ch0 & off_mask)) & off_mask
    else:
        rank_f, off_pair, packed = filled[:3]
        r = slot - off_pair
    gsrc = rank_f - 1  # (P,)
    valid = (slot < jnp.minimum(total, cap)) & (gsrc >= 0)

    sw_p = packed & ((1 << bsw) - 1)
    y0_p = jax.lax.shift_right_logical(packed, bsw) & ((1 << by) - 1)
    x0_p = jax.lax.shift_right_logical(packed, by + bsw)
    # integer div/mod have no VPU hardware path; float reciprocal math is
    # exact here (r, sw < 2^24)
    swf = sw_p.astype(jnp.float32)
    if span_chans is not None:
        # 3-zone decode: row 0 spans [d0, d0+w0), middles the full width,
        # the last row [d1, d1+w1) (sh == 1: row 0 only; w == 0 rows are
        # skipped by the layout itself)
        chb, chc = filled[base], filled[base + 1]
        mask_sw = (1 << bsw) - 1
        w0p = chb & mask_sw
        d0p = jax.lax.shift_right_logical(chb, bsw)
        sh_p = chc & ((1 << bsh) - 1)
        w1p = jax.lax.shift_right_logical(chc, bsh) & mask_sw
        d1p = jax.lax.shift_right_logical(chc, bsh + bsw)
        in0 = r < w0p
        rm = r - w0p
        nmid = sh_p - 2
        qm = jnp.floor(rm.astype(jnp.float32) / swf).astype(jnp.int32)
        in_last = (~in0) & (qm >= nmid)
        q = jnp.where(in0, 0, jnp.where(in_last, sh_p - 1, 1 + qm))
        col = jnp.where(
            in0,
            d0p + r,
            jnp.where(in_last, d1p + (rm - nmid * sw_p), rm - qm * sw_p),
        )
        tile = (y0_p + q) * tx_n + x0_p + col
    else:
        q = jnp.floor(r.astype(jnp.float32) / swf).astype(jnp.int32)
        col = r - q * sw_p
        tile = (y0_p + q) * tx_n + x0_p + col

    if conics is not None:
        # exact conic-vs-tile-rect cull (pinhole): the pair's tile rect in
        # NDC (pixel_ndc convention: k = 2*px/W - 1, covering every pixel
        # center the tile contains)
        bc = jax.lax.bitcast_convert_type
        gc = tuple(
            bc(v, jnp.float32)
            for v in filled[base + n_span : base + 6 + n_span]
        )
        tx_p = x0_p + col
        ty_p = y0_p + q + (0 if tile_rows is None else tile_rows[0])
        tw, th = config.tile_w, config.tile_h
        Wpx, Hpx = camera.width, camera.height
        fx = tx_p.astype(jnp.float32)
        fy = ty_p.astype(jnp.float32)
        kx0 = 2.0 * (fx * tw) / Wpx - 1.0
        kx1 = 2.0 * (fx * tw + tw) / Wpx - 1.0
        ky0 = 2.0 * (fy * th) / Hpx - 1.0
        ky1 = 2.0 * (fy * th + th) / Hpx - 1.0
        dead = _conic_rect_cull(gc, kx0, kx1, ky0, ky1)
        valid = valid & ~dead

    if sector is not None:
        # fisheye ANNULAR-SECTOR cull: the footprint rect is the bbox of
        # an annular sector in NDC around the optical center; bbox-corner
        # tiles provably outside the sector (measured 68% of emitted
        # fisheye pairs at the 768^2/100k bench config) are dropped
        # before the tile sort. Tests, all conservative (pad covers the
        # rect's own _MARGIN + pixel-center slack):
        #   radial: tile rect entirely beyond r_hi or inside the r_lo
        #           hole;
        #   azimuth (cos_dphi >= 0 only, where the sector lies in its
        #           center-azimuth cone): support of the rect against the
        #           wedge-center direction below mindist * cos(dphi).
        bc = jax.lax.bitcast_convert_type
        cph, sph, cdp, rlo_s, rhi_s = (
            bc(filled[base_sector + k], jnp.float32) for k in range(5)
        )
        tx_s = x0_p + col
        ty_s = y0_p + q + (0 if tile_rows is None else tile_rows[0])
        tw_s, th_s = config.tile_w, config.tile_h
        Wpx_s, Hpx_s = camera.width, camera.height
        fx_s = tx_s.astype(jnp.float32)
        fy_s = ty_s.astype(jnp.float32)
        sx0 = 2.0 * (fx_s * tw_s) / Wpx_s - 1.0
        sx1 = 2.0 * (fx_s * tw_s + tw_s) / Wpx_s - 1.0
        sy0 = 2.0 * (fy_s * th_s) / Hpx_s - 1.0
        sy1 = 2.0 * (fy_s * th_s + th_s) / Hpx_s - 1.0
        nx = jnp.clip(0.0, sx0, sx1)  # rect point nearest the center
        ny = jnp.clip(0.0, sy0, sy1)
        mind2 = nx * nx + ny * ny
        ax_m = jnp.maximum(jnp.abs(sx0), jnp.abs(sx1))
        ay_m = jnp.maximum(jnp.abs(sy0), jnp.abs(sy1))
        maxd2 = ax_m * ax_m + ay_m * ay_m
        pad = 0.002 + 6.0 / Wpx_s  # eigensolve margin + ~3px slack (NDC)
        rhi_p = rhi_s + pad
        rlo_p = jnp.maximum(rlo_s - pad, 0.0)
        dead_r = (mind2 > rhi_p * rhi_p) | (maxd2 < rlo_p * rlo_p)
        # azimuth: the wedge cone {|angle(p, m)| <= dphi} (dphi < pi/2) is
        # bounded by two LINES through the center; each bounds a
        # half-plane disjoint from the cone, so "rect entirely beyond
        # either boundary line" is an exact convex separation test and a
        # LINEAR functional over the rect: with m = (cph, sph),
        #   L(p) = cross(m, p) cdp - dot(m, p) sdp   (left boundary)
        #   R(p) = -cross(m, p) cdp - dot(m, p) sdp  (right boundary)
        # min over the rect = sum of per-axis minima of the coefficients.
        sdp = jnp.sqrt(jnp.maximum(1.0 - cdp * cdp, 0.0))
        ax_l = -sph * cdp - cph * sdp  # L = ax_l * x + ay_l * y
        ay_l = cph * cdp - sph * sdp
        ax_r = sph * cdp - cph * sdp
        ay_r = -cph * cdp - sph * sdp
        min_l = (jnp.minimum(sx0 * ax_l, sx1 * ax_l)
                 + jnp.minimum(sy0 * ay_l, sy1 * ay_l))
        min_r = (jnp.minimum(sx0 * ax_r, sx1 * ax_r)
                 + jnp.minimum(sy0 * ay_r, sy1 * ay_r))
        dead_az = (cdp >= 0.0) & (
            (min_l > pad) | (min_r > pad)
        )
        valid = valid & ~(dead_r | dead_az)

    # tile sort. gid values are depth RANKS (0..n-1, nondecreasing along the
    # emission stream), so when tile and rank bits fit an int31 the sort
    # runs over ONE packed key array (tile << rank_bits | rank): rank
    # uniqueness makes the keys globally unique, which both preserves the
    # within-tile depth order WITHOUT a stable sort and removes the payload
    # array from the sort entirely (keys-only sorts measure ~25% faster,
    # PERF.md). Wide grids/scenes fall back to the stable 2-array sort.
    rank_bits = max(1, (n - 1).bit_length()) if n > 1 else 1
    tile_bits = max(1, n_tiles.bit_length())
    if rank_bits + tile_bits <= 31:
        sentinel = jnp.int32(n_tiles << rank_bits)
        pkey = jnp.where(
            valid, jax.lax.shift_left(tile, rank_bits) | gsrc, sentinel
        )
        key_s = jax.lax.sort(pkey)
        gid_s = jnp.where(
            key_s >= sentinel, -1, key_s & ((1 << rank_bits) - 1)
        )
        starts = jnp.searchsorted(
            key_s,
            jax.lax.shift_left(
                jnp.arange(n_tiles + 1, dtype=jnp.int32), rank_bits
            ),
        ).astype(jnp.int32)
        key_s = jax.lax.shift_right_logical(key_s, rank_bits)  # tile ids
    else:
        key = jnp.where(valid, tile, n_tiles)  # invalids sort last
        payload = jnp.where(valid, gsrc, -1)
        # STABLE tile sort: emission (= depth-rank) order is preserved
        # within each tile's segment
        key_s, gid_s = jax.lax.sort((key, payload), num_keys=1, is_stable=True)
        starts = jnp.searchsorted(
            key_s, jnp.arange(n_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
    n_dropped = jnp.maximum(total - cap, 0)
    return PairStream(
        gid=gid_s, key=key_s, starts=starts, n_pairs=total,
        n_dropped=n_dropped, order=order,
    )


def _conic_row_span(gc, ky0, ky1):
    """Conservative NDC x-interval of the live region {q >= 0} over the
    NDC y-slab [ky0, ky1] (all inputs broadcastable; conic columns
    normalized as in projection_conics).

    For an ellipse (g00 < 0, g11 < 0, det > 0) the live region is convex,
    so the slab's x-extent is attained either at a slab boundary (roots of
    the fixed-ky quadratic) or at the region's global x-extreme (roots of
    the y-eliminated quadratic) when its critical ky lies inside the slab.
    Every candidate is evaluated and min/max-folded, so the returned
    interval contains the true extent (sound); a small NDC margin absorbs
    f32 rounding of the normalized coefficients.

    Returns (xmin, xmax, ok): ok=False means "not provably boundable" —
    caller must fall back to the full rect row. xmin > xmax with ok=True
    means the row is provably dead (zero pairs).
    """
    g00, g01, g11, g02, g12, g22 = gc
    ok = (g00 < -1e-12) & (g11 < -1e-12) & (g00 * g11 - g01 * g01 > 0.0)
    inf = jnp.float32(jnp.inf)

    def fold(lo, hi, r1, r2, has):
        lo = jnp.minimum(lo, jnp.where(has, jnp.minimum(r1, r2), inf))
        hi = jnp.maximum(hi, jnp.where(has, jnp.maximum(r1, r2), -inf))
        return lo, hi

    lo, hi = inf, -inf
    for ky in (ky0, ky1):
        b = g01 * ky + g02
        cc = (g11 * ky + 2.0 * g12) * ky + g22
        disc = b * b - g00 * cc
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv = 1.0 / jnp.minimum(g00, -1e-30)
        lo, hi = fold(lo, hi, (-b - s) * inv, (-b + s) * inv, disc >= 0.0)
    # global x-extremes: eliminate ky (critical ky(x) = -(g01 x + g12)/g11)
    inv11 = 1.0 / jnp.minimum(g11, -1e-30)
    a_t = g00 - g01 * g01 * inv11  # < 0 whenever det > 0 and g11 < 0
    b_t = g02 - g01 * g12 * inv11
    c_t = g22 - g12 * g12 * inv11
    disc_t = b_t * b_t - a_t * c_t
    s_t = jnp.sqrt(jnp.maximum(disc_t, 0.0))
    inv_t = 1.0 / jnp.minimum(a_t, -1e-30)
    for sgn in (-1.0, 1.0):
        x_e = (-b_t + sgn * s_t) * inv_t
        ky_e = -(g01 * x_e + g12) * inv11
        use = (disc_t >= 0.0) & (ky_e > ky0) & (ky_e < ky1)
        lo, hi = fold(lo, hi, x_e, x_e, use)
    margin = 1e-4  # NDC; |g| <= 1 keeps root rounding well below this
    return lo - margin, hi + margin, ok


def _edge_row_spans(conics, x0, y0, sw, sh, camera: Camera,
                    config: RenderConfig, row_lo: int | jnp.ndarray = 0):
    """Exact conic x-spans for each gaussian's TOP and BOTTOM tile rows.

    Middle rows keep the rect's full width (the ellipse is widest there),
    so the expansion's slot arithmetic stays invertible with per-gaussian
    constants only — no per-row stream is ever materialized and the owner
    scatter stays O(N). For sh == 1 the single row gets its exact span
    (w1 = 0); a dead edge row yields w = 0 and simply emits nothing.

    Returns (d0, w0, d1, w1): offsets relative to x0 and widths, all (N,)
    int32, conservative (ok=False rows fall back to the full width).
    """
    th, tw = config.tile_h, config.tile_w
    Hpx, Wpx = camera.height, camera.width

    def span_for(ty_local):
        fy = (ty_local + row_lo).astype(jnp.float32)
        ky0 = 2.0 * (fy * th) / Hpx - 1.0
        ky1 = 2.0 * (fy * th + th) / Hpx - 1.0
        xmin, xmax, ok = _conic_row_span(conics, ky0, ky1)
        sx0 = jnp.floor((xmin + 1.0) * (0.5 * Wpx / tw)).astype(jnp.int32)
        sx1 = jnp.floor((xmax + 1.0) * (0.5 * Wpx / tw)).astype(jnp.int32)
        x1 = x0 + sw - 1
        empty = ok & ((sx1 < x0) | (sx0 > x1) | (xmin > xmax))
        a = jnp.where(ok, jnp.clip(sx0, x0, x1), x0)
        b = jnp.where(ok, jnp.clip(sx1, x0, x1), x1)
        d = jnp.where(empty, 0, a - x0)
        w = jnp.where(empty, 0, b - a + 1)
        return d, w

    d0, w0 = span_for(y0)
    d1, w1 = span_for(y0 + sh - 1)
    one_row = sh <= 1
    d1 = jnp.where(one_row, 0, d1)
    w1 = jnp.where(one_row, 0, w1)
    return d0, w0, d1, w1


def _bin_pairs_affine(
    fp: Footprint,
    camera: Camera,
    config: RenderConfig,
    cap: int,
    akey: tuple,
) -> PairStream:
    """Gather-free pair expansion with per-pair AFFINE depth keys.

    Like _bin_pairs_presorted, but each pair's depth key is its own tile's
    value of the gaussian's affine log-t model (affine_tile_keys) instead of
    one shared per-gaussian key: two extra head-fills carry the quantized
    model (corner value + packed slopes) onto the stream, and each pair
    reconstitutes its key with two integer multiply-adds. No N-presort and
    no rank-space gid (consumers index original tables directly); ONE
    non-stable sort over tile<<db | depth_q packed keys.

    Within-tile ordering approaches the reference's exact per-ray k-buffer
    order (shaders/tracer.cu:124-153) as footprints shrink; the march's
    window sort mops up the residual (and fires its already-sorted skip far
    more often than under per-gaussian keys).
    """
    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * ty_n
    tile_bits, depth_bits = _depth_bits(n_tiles)
    n = fp.px.shape[0]
    a_q, bc_q = akey

    x0, y0, sw, count = _tile_rects(fp, camera, config)

    offsets = jnp.cumsum(count) - count  # exclusive
    total = offsets[-1] + count[-1] if n else jnp.int32(0)
    first = jnp.minimum(offsets, cap)

    gids = jnp.arange(n, dtype=jnp.int32)
    buf = jnp.zeros((cap + 1,), jnp.int32).at[first].max(gids + 1)
    gsrc = jax.lax.cummax(buf[:cap]) - 1  # (P,)
    slot = jnp.arange(cap, dtype=jnp.int32)
    valid = (slot < jnp.minimum(total, cap)) & (gsrc >= 0)

    # --- per-pair context via head fills (no gathers) ------------------
    off_pair = _head_fill(first, offsets, cap)
    bx = max(1, (tx_n - 1).bit_length())
    by = max(1, (ty_n - 1).bit_length())
    bsw = max(1, tx_n.bit_length())
    if bx + by + bsw > 31:
        raise ValueError(f"tile grid too large to pack: {tx_n}x{ty_n}")
    sw1 = jnp.maximum(sw, 1)
    packed = _head_fill(
        first,
        jax.lax.shift_left(x0, by + bsw) | jax.lax.shift_left(y0, bsw) | sw1,
        cap,
    )
    sw_p = packed & ((1 << bsw) - 1)
    y0_p = jax.lax.shift_right_logical(packed, bsw) & ((1 << by) - 1)
    x0_p = jax.lax.shift_right_logical(packed, by + bsw)
    a_p = _head_fill(first, a_q, cap)
    bc_p = _head_fill(first, bc_q, cap)
    b_p = jax.lax.shift_right_logical(bc_p, 13) - _SLOPE_OFF
    c_p = (bc_p & 8191) - _SLOPE_OFF

    r = slot - off_pair
    q = jnp.floor(r.astype(jnp.float32) / sw_p.astype(jnp.float32)).astype(
        jnp.int32
    )
    dtx = r - q * sw_p
    tile = (y0_p + q) * tx_n + x0_p + dtx

    qbits = min(depth_bits, _QBITS)
    dq = jnp.clip(a_p + b_p * dtx + c_p * q, 0, (1 << qbits) - 2)
    key = jax.lax.shift_left(tile, depth_bits) | jax.lax.shift_left(
        dq, depth_bits - qbits
    )
    key = jnp.where(valid, key, _INT32_MAX)
    payload = jnp.where(valid, gsrc, -1)
    key_s, gid_s = jax.lax.sort_key_val(key, payload)

    boundaries = jax.lax.shift_left(
        jnp.arange(n_tiles + 1, dtype=jnp.int32), depth_bits
    )
    starts = jnp.searchsorted(key_s, boundaries).astype(jnp.int32)
    n_dropped = jnp.maximum(total - cap, 0)
    return PairStream(
        gid=gid_s, key=key_s, starts=starts, n_pairs=total, n_dropped=n_dropped
    )


def bin_pairs(
    fp: Footprint,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
    geom: tuple | None = None,
    tile_rows=None,
) -> PairStream:
    """Expand footprints into the depth-sorted per-tile pair stream.

    geom: optional (means (N,3), M9 (N,9) rows of S^-1 R^T, radius (N,)).
    When given (config.pair_keys == "tile"), each pair's sort key is the
    EXACT iso-ellipsoid event t of its gaussian along its own tile's central
    ray, instead of one per-gaussian depth shared by all tiles. Rays inside
    a tile deviate little from the tile's central ray, so per-tile key order
    is close to exact per-ray order — this recovers the reference's per-ray
    k-buffer ordering (shaders/tracer.cu:124-153) without any per-ray sort
    in the march (measured: +10 dB PSNR vs per-gaussian keys on synthetic
    scenes). Costs one wider packed gather in the expansion; the int32
    columns ride in the float gather via bitcast.
    """
    if tile_rows is not None and (geom is not None and config.pair_keys != "gaussian"):
        raise ValueError("per-shard binning supports the default pair_keys only")
    if geom is not None and config.pair_keys == "affine":
        tx_n, ty_n = num_tiles(camera, config)
        _, depth_bits = _depth_bits(tx_n * ty_n)
        means, M9, _radius = geom
        akey = affine_tile_keys(means, M9, fp, camera, config, depth_bits)
        return _bin_pairs_affine(fp, camera, config, pair_capacity, akey)
    use_tile_keys = geom is not None and config.pair_keys in ("tile", "tile_peak")
    if not use_tile_keys:
        # default path: depth-pre-sorted gather-free expansion
        conics = None
        spans = None
        pinhole = config.camera_model == CameraModel.PINHOLE
        if geom is not None and pinhole and (
            config.conic_cull or config.row_span
        ):
            conics = projection_conics(geom, camera)
            if config.row_span:
                x0s, y0s, sws, counts = _tile_rects(
                    fp, camera, config, tile_rows=tile_rows
                )
                sws1 = jnp.maximum(sws, 1)
                shs = jnp.floor(
                    counts.astype(jnp.float32) / sws1.astype(jnp.float32)
                ).astype(jnp.int32)
                spans = _edge_row_spans(
                    conics, x0s, y0s, sws1, shs, camera, config,
                    row_lo=0 if tile_rows is None else tile_rows[0],
                )
                if not config.conic_cull:
                    conics = None
        return _bin_pairs_presorted(
            fp, camera, config, pair_capacity, tile_rows=tile_rows,
            conics=conics, spans=spans,
            sector=(fp.sector if (config.fisheye_cull
                                  and fp.sector is not None) else None),
        )

    tw, th = config.tile_w, config.tile_h
    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * ty_n
    tile_bits, depth_bits = _depth_bits(n_tiles)
    n = fp.px.shape[0]
    cap = pair_capacity

    x0, y0, sw, count = _tile_rects(fp, camera, config)

    offsets = jnp.cumsum(count) - count  # exclusive
    total = offsets[-1] + count[-1] if n else jnp.int32(0)

    # --- pair expansion: owner gaussian of each pair slot -----------------
    # scatter-max each gaussian's id+1 at its first slot, forward-fill with a
    # cumulative max. offsets are nondecreasing, so for any slot p the
    # largest marked id at or before p is exactly the owning gaussian
    # (zero-count gaussians share their successor's offset and lose the max).
    gids = jnp.arange(n, dtype=jnp.int32)
    first = jnp.minimum(offsets, cap)
    buf = jnp.zeros((cap + 1,), jnp.int32).at[first].max(gids + 1)
    gsrc = jax.lax.cummax(buf[:cap]) - 1  # (P,)
    slot = jnp.arange(cap, dtype=jnp.int32)
    valid = (slot < jnp.minimum(total, cap)) & (gsrc >= 0)
    gsrc_safe = jnp.maximum(gsrc, 0)

    # --- per-pair context via ONE packed row gather ------------------------
    dq_g = _quantize_depth(fp.depth, depth_bits)
    icols = [offsets, x0, y0, jnp.maximum(sw, 1), dq_g]
    info_i = jnp.stack(icols, axis=1)
    if use_tile_keys:
        means, M9, radius = geom
        info = jnp.concatenate(
            [
                jax.lax.bitcast_convert_type(info_i, jnp.float32),
                means,
                M9,
                radius[:, None],
                fp.depth[:, None],
            ],
            axis=1,
        )  # (N, 19) single mixed-dtype gather table
        rows_f = info[gsrc_safe]
        rows = jax.lax.bitcast_convert_type(rows_f[:, :5], jnp.int32)
    else:
        rows = info_i[gsrc_safe]  # (P, 5)
    r = slot - rows[:, 0]
    # integer div/mod have no VPU hardware path; float reciprocal math is
    # exact here (r, sw < 2^24)
    sw_f = rows[:, 3].astype(jnp.float32)
    q = jnp.floor(r.astype(jnp.float32) / sw_f).astype(jnp.int32)
    tx = rows[:, 1] + (r - q * rows[:, 3])
    ty = rows[:, 2] + q
    tile = ty * tx_n + tx

    if use_tile_keys:
        # exact event t along this tile's central ray (ordering within a
        # tile is scale-invariant, so the unnormalized direction is fine)
        dcx, dcy, dcz = _tile_center_dirs(tx, ty, camera, config)
        mx, my, mz = rows_f[:, 5], rows_f[:, 6], rows_f[:, 7]
        m = [rows_f[:, 8 + k] for k in range(9)]
        rad = rows_f[:, 17]
        ex, ey, ez = camera.eye
        ox, oy, oz = ex - mx, ey - my, ez - mz
        ogx = m[0] * ox + m[1] * oy + m[2] * oz
        ogy = m[3] * ox + m[4] * oy + m[5] * oz
        ogz = m[6] * ox + m[7] * oy + m[8] * oz
        dgx = m[0] * dcx + m[1] * dcy + m[2] * dcz
        dgy = m[3] * dcx + m[4] * dcy + m[5] * dcz
        dgz = m[6] * dcx + m[7] * dcy + m[8] * dcz
        dd = jnp.maximum(dgx * dgx + dgy * dgy + dgz * dgz, 1e-12)
        od = ogx * dgx + ogy * dgy + ogz * dgz
        oo = ogx * ogx + ogy * ogy + ogz * ogz
        dn = jnp.sqrt(dcx * dcx + dcy * dcy + dcz * dcz)
        gkey = rows_f[:, 18]
        if config.pair_keys == "tile_peak":
            # peak-response t along the tile ray: smooth in the ray (no
            # entry-sqrt grazing singularity), consistent for hit and miss
            depth_pair = (-od / dd) * dn
        else:  # "tile": iso-ellipsoid entry along the tile ray
            disc = od * od - dd * (oo - rad * rad)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_entry = (-od - sq) / dd
            t_exit = (-od + sq) / dd
            t_event = jnp.where(t_entry > 0.0, t_entry, t_exit) * dn
            # central miss: per-gaussian entry key (same entry-time units)
            depth_pair = jnp.where(disc >= 0.0, t_event, gkey)
        # dead rays (fisheye blank): per-gaussian key fallback
        depth_pair = jnp.where(dn > 1e-6, depth_pair, gkey)
        dq = _quantize_depth(depth_pair, depth_bits)
    else:
        dq = rows[:, 4]

    key = jax.lax.shift_left(tile, depth_bits) | dq
    key = jnp.where(valid, key, _INT32_MAX)
    payload = jnp.where(valid, gsrc_safe, -1)
    key_s, gid_s = jax.lax.sort_key_val(key, payload)

    boundaries = jax.lax.shift_left(
        jnp.arange(n_tiles + 1, dtype=jnp.int32), depth_bits
    )
    starts = jnp.searchsorted(key_s, boundaries).astype(jnp.int32)
    n_dropped = jnp.maximum(total - cap, 0)
    return PairStream(
        gid=gid_s, key=key_s, starts=starts, n_pairs=total, n_dropped=n_dropped
    )


def _tile_center_dirs(tx, ty, camera: Camera, config: RenderConfig):
    """Unnormalized central-ray direction of tile (tx, ty), per pair.

    Mirrors cameras.generate_rays at the tile-center pixel (pure math, no
    gathers: the expansion stream stays gather-minimal).
    """
    U, V, W = camera.uvw_frame()
    px = (tx.astype(jnp.float32) + 0.5) * config.tile_w
    py = (ty.astype(jnp.float32) + 0.5) * config.tile_h
    ndc_x = 2.0 * px / camera.width - 1.0
    ndc_y = 2.0 * py / camera.height - 1.0
    if config.camera_model != CameraModel.FISHEYE:
        # PINHOLE; OPENCV uses the undistorted approximation (these are
        # ordering keys for the experimental pair_keys modes, not rays)
        dx = ndc_x * -U[0] + ndc_y * -V[0] + W[0]
        dy = ndc_x * -U[1] + ndc_y * -V[1] + W[1]
        dz = ndc_x * -U[2] + ndc_y * -V[2] + W[2]
    else:  # FISHEYE (shaders/tracer.cuh:136-165)
        rr = jnp.sqrt(ndc_x * ndc_x + ndc_y * ndc_y)
        f = config.fisheye_focal
        theta = 2.0 * jnp.arcsin(jnp.clip(rr / (2.0 * f), -1.0, 1.0))
        phi = jnp.arctan2(ndc_y, ndc_x)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        lx, ly, lz = st * jnp.cos(phi), st * jnp.sin(phi), ct
        live = (rr <= 1.0).astype(jnp.float32)
        dx = (lx * -U[0] + ly * -V[0] + lz * W[0]) * live
        dy = (lx * -U[1] + ly * -V[1] + lz * W[1]) * live
        dz = (lx * -U[2] + ly * -V[2] + lz * W[2]) * live
    return dx, dy, dz


def bin_tiles(
    fp: Footprint,
    camera: Camera,
    config: RenderConfig,
    pair_capacity: int,
    geom: tuple | None = None,
) -> TileBinning:
    """Fixed-capacity per-tile candidate lists (XLA tiled-march layout)."""
    stream = bin_pairs(fp, camera, config, pair_capacity, geom=geom)
    tx_n, ty_n = num_tiles(camera, config)
    n_tiles = tx_n * ty_n
    m_cap = config.max_per_tile

    counts_t = jnp.diff(stream.starts)
    clipped = jnp.minimum(counts_t, m_cap)
    slots = jnp.arange(m_cap, dtype=jnp.int32)
    pos = stream.starts[:n_tiles, None] + slots[None, :]
    valid = slots[None, :] < clipped[:, None]
    cand = jnp.where(
        valid, stream.gid[jnp.clip(pos, 0, pair_capacity - 1)], -1
    )
    tile_overflow = jnp.sum(counts_t - clipped)
    return TileBinning(
        cand=cand,
        counts=clipped,
        n_pairs=stream.n_pairs,
        n_dropped=stream.n_dropped + tile_overflow,
        order=stream.order,
    )
