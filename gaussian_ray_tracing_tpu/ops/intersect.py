"""Ray-triangle intersection (Moller-Trumbore) and batched closest hit.

TPU-native replacement for the reference's second OptiX IAS over inserted
reflection primitives (src/GaussianTracer.cpp:578-651): a brute-force,
chunked closest-hit sweep over the triangle soup (meshes here are small
viewer props — plane 2 tris, spheres, OBJ inserts). Triangles are
double-sided, as in the reference (no cull flags set,
src/GaussianTracer.cpp:355-360).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MeshHit(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance (inf = miss)
    face: jnp.ndarray  # (R,) int32 face index (-1 = miss)
    u: jnp.ndarray  # (R,) barycentric of vertex 1
    v: jnp.ndarray  # (R,) barycentric of vertex 2

    @property
    def hit(self):
        return self.face >= 0


def moller_trumbore(
    origins, dirs, v0, v1, v2, t_min: float, t_max: float, edge_eps: float = 1e-6
):
    """Intersect rays (..., 3) against triangles (..., 3) (broadcast).

    Returns (hit_mask, t, u, v); double-sided. The barycentric test uses a
    small tolerance so rays crossing a shared edge cannot fall between both
    triangles from rounding (OptiX traversal is watertight; brute-force
    Moller-Trumbore is not) — edge rays may hit both triangles at the same t,
    which closest-hit resolves harmlessly.

    TPU layout note: all math is scalarized into per-component arrays so no
    broadcast intermediate carries a trailing length-3 axis (XLA lane-pads
    those to 128 — a 42x memory blowup at (rays, faces, 3) scale).
    """
    cx = lambda a, i: a[..., i]
    ox, oy, oz = cx(origins, 0), cx(origins, 1), cx(origins, 2)
    dx, dy, dz = cx(dirs, 0), cx(dirs, 1), cx(dirs, 2)
    e1x, e1y, e1z = cx(v1, 0) - cx(v0, 0), cx(v1, 1) - cx(v0, 1), cx(v1, 2) - cx(v0, 2)
    e2x, e2y, e2z = cx(v2, 0) - cx(v0, 0), cx(v2, 1) - cx(v0, 1), cx(v2, 2) - cx(v0, 2)

    # p = dirs x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    ok = jnp.abs(det) > 1e-12
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tx, ty, tz = ox - cx(v0, 0), oy - cx(v0, 1), oz - cx(v0, 2)
    u = (tx * px + ty * py + tz * pz) * inv_det
    # q = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        ok
        & (u >= -edge_eps)
        & (v >= -edge_eps)
        & (u + v <= 1.0 + edge_eps)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def closest_hit(
    origins: jnp.ndarray,  # (R, 3)
    dirs: jnp.ndarray,  # (R, 3)
    tri_v0: jnp.ndarray,  # (F, 3) world-space
    tri_v1: jnp.ndarray,
    tri_v2: jnp.ndarray,
    t_min: float,
    t_max: float,
    face_chunk: int = 2048,
) -> MeshHit:
    """Closest hit over all faces, scanning face chunks to bound memory."""
    F = tri_v0.shape[0]
    n_chunks = max(-(-F // face_chunk), 1)
    pad = n_chunks * face_chunk - F

    def _pad(x):
        return jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    v0 = _pad(tri_v0).reshape(n_chunks, face_chunk, 3)
    v1 = _pad(tri_v1).reshape(n_chunks, face_chunk, 3)
    v2 = _pad(tri_v2).reshape(n_chunks, face_chunk, 3)
    # padding faces are degenerate (zero area) => det ~ 0 => never hit

    R = origins.shape[0]
    init = MeshHit(
        t=jnp.full((R,), jnp.inf, jnp.float32),
        face=jnp.full((R,), -1, jnp.int32),
        u=jnp.zeros((R,), jnp.float32),
        v=jnp.zeros((R,), jnp.float32),
    )

    def step(best, inputs):
        c_idx, c_v0, c_v1, c_v2 = inputs
        hit, t, u, v = moller_trumbore(
            origins[:, None, :], dirs[:, None, :], c_v0[None], c_v1[None], c_v2[None],
            t_min, t_max,
        )  # (R, face_chunk)
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[:, None], axis=-1)[:, 0]
        better = tj < best.t
        take = lambda arr: jnp.take_along_axis(arr, j[:, None], axis=-1)[:, 0]
        new = MeshHit(
            t=jnp.where(better, tj, best.t),
            face=jnp.where(better, c_idx * face_chunk + j.astype(jnp.int32), best.face),
            u=jnp.where(better, take(u), best.u),
            v=jnp.where(better, take(v), best.v),
        )
        return new, None

    best, _ = jax.lax.scan(
        step, init, (jnp.arange(n_chunks, dtype=jnp.int32), v0, v1, v2)
    )
    return best


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection d - 2<d,n>n (shaders/tracer.cuh:396-404)."""
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


def refract_or_tir(d: jnp.ndarray, n: jnp.ndarray, etai_over_etat: float):
    """Snell refraction with total-internal-reflection fallback.

    Reproduces refract() (shaders/tracer.cuh:432-465): etai_over_etat is the
    glass/air ratio n2/n1; entering front faces uses 1/etai_over_etat and
    back faces flip the normal.

    Returns (new_dir, reflected_mask).
    """
    entering = jnp.sum(d * n, axis=-1, keepdims=True) < 0.0
    ri = jnp.where(entering, 1.0 / etai_over_etat, etai_over_etat)[..., 0]
    n_eff = jnp.where(entering, n, -n)
    cos_theta = jnp.minimum(jnp.sum(-d * n_eff, axis=-1), 1.0)
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    cannot = ri * sin_theta > 1.0

    # TIR branch: reflect about the side of the surface the ray is on
    facing = jnp.sum(d * n_eff, axis=-1, keepdims=True) < 0.0
    refl_n = jnp.where(facing, n_eff, -n_eff)
    d_reflect = reflect(d, refl_n)

    r_out_perp = ri[..., None] * (d + cos_theta[..., None] * n_eff)
    par = -jnp.sqrt(jnp.abs(1.0 - jnp.sum(r_out_perp * r_out_perp, axis=-1)))
    d_refract = r_out_perp + par[..., None] * n_eff

    new_d = jnp.where(cannot[..., None], d_reflect, d_refract)
    return new_d, cannot
