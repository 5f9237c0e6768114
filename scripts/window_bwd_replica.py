"""Debug: hand-written WINDOW backward vs autodiff of a pure-jnp replica.

The replica re-implements _march_kernel's window path 1:1 in differentiable
jnp (same bitonic network via jnp.roll, straight-through quantization), so
jax.grad of the replica is the ground truth for the kernel's gradient
ROUTING through the per-ray sort. Any permutation/attribution bug in
_march_bwd_kernel shows up here at >> float tolerance.

Usage: JAX_PLATFORMS=cpu python scripts/window_bwd_replica.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.pallas_renderer import prepare_pair_stream
from gaussian_ray_tracing_tpu.models.tiled import tile_rays
from gaussian_ray_tracing_tpu.ops.pallas_march import (
    _MX, _M0, _OP, _RAD, _SH0, march_stream_diff,
)
from gaussian_ray_tracing_tpu.ops.sh import SH_C0, num_coeffs
from gaussian_ray_tracing_tpu.ops.tiles import num_tiles
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

INT_MAX = jnp.int32(2147483647)


def _st(x, q):
    """straight-through: forward value q(x), gradient of identity."""
    return x + jax.lax.stop_gradient(q - x)


def _jroll(x, shift):
    return jnp.roll(x, shift, axis=0)


def _bitonic_jnp(key, payloads, c):
    idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    n_lv = c.bit_length() - 1
    payloads = tuple(payloads)
    for k in range(1, n_lv + 1):
        desc = (idx & (1 << k)) != 0
        for j in reversed(range(k)):
            d = 1 << j
            hi = (idx & d) != 0
            pk = jnp.where(hi, _jroll(key, d), _jroll(key, -d))
            rolled = tuple(
                jnp.where(hi, _jroll(p, d), _jroll(p, -d)) for p in payloads
            )
            keep_min = hi == desc
            take = (pk < key) == keep_min
            key = jnp.where(take, pk, key)
            payloads = tuple(
                jnp.where(take, rp, p) for rp, p in zip(rolled, payloads)
            )
    return key, payloads


def replica_march(starts, eye, feats, dirs_t, cfg, n_tiles, R, c,
                  origins_t=None, t_lo_t=None, t_hi_t=None, t0_t=None):
    """Differentiable jnp replica of the window-order march over the pair
    stream (sh_degree 0; optional per-ray origins / [t_lo, t_hi] windows /
    carry-in transmittance, mirroring pallas_march_stream's extras)."""
    f32 = jnp.float32
    K = num_coeffs(cfg.sh_degree)
    assert cfg.sh_degree == 0
    ex, ey, ez = eye[0], eye[1], eye[2]

    # python loop over tiles/chunks (tiny scenes only — debug tool)
    starts_np = np.asarray(starts)
    rgb_out = []
    t_out = []
    for tid in range(n_tiles):
        start = int(starts_np[tid])
        n = int(starts_np[tid + 1]) - start
        n_chunks = -(-n // c)
        dirs = dirs_t[tid]  # (R, 3)
        dx = dirs[:, 0][None, :]
        dy = dirs[:, 1][None, :]
        dz = dirs[:, 2][None, :]
        live = dx * dx + dy * dy + dz * dz > 0.01
        t_lo = (jnp.full((1, R), cfg.t_min, f32) if t_lo_t is None
                else t_lo_t[tid][None, :])
        t_hi = (jnp.full((1, R), cfg.t_max, f32) if t_hi_t is None
                else t_hi_t[tid][None, :])
        t_carry = (jnp.ones((1, R), f32) if t0_t is None
                   else t0_t[tid][None, :].astype(f32))
        acc = jnp.zeros((3, R), f32)
        cand_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
        for j in range(n_chunks):
            g = feats[start + j * c : start + (j + 1) * c]
            active = jnp.max(t_carry) > cfg.min_transmittance
            col = lambda k: g[:, k : k + 1]
            m = [col(_M0 + k) for k in range(9)]
            op = col(_OP)
            rad = col(_RAD)
            if origins_t is not None:
                ox = origins_t[tid][:, 0][None, :] - col(_MX)  # (c, R)
                oy = origins_t[tid][:, 1][None, :] - col(_MY_)
                oz = origins_t[tid][:, 2][None, :] - col(_MZ_)
            else:
                ox = ex - col(_MX)
                oy = ey - col(_MY_)
                oz = ez - col(_MZ_)
            ogx = m[0] * ox + m[1] * oy + m[2] * oz
            ogy = m[3] * ox + m[4] * oy + m[5] * oz
            ogz = m[6] * ox + m[7] * oy + m[8] * oz
            dgx = m[0] * dx + m[1] * dy + m[2] * dz
            dgy = m[3] * dx + m[4] * dy + m[5] * dz
            dgz = m[6] * dx + m[7] * dy + m[8] * dz
            dd = dgx * dgx + dgy * dgy + dgz * dgz
            od = ogx * dgx + ogy * dgy + ogz * dgz
            oo = ogx * ogx + ogy * ogy + ogz * ogz
            t_star = -od / jnp.maximum(dd, 1e-6)
            pp = oo + t_star * (2.0 * od + t_star * dd)
            resp = jnp.exp(-0.5 * jnp.maximum(pp, 0.0))
            alpha = jnp.minimum(cfg.alpha_clamp, resp * op)
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
                & (alpha > cfg.alpha_min)
            )
            hm = cfg.hit_multiplicity
            a_eff = alpha if hm == 1 else 1.0 - (1.0 - alpha) ** hm
            a = jnp.where(gate, a_eff, 0.0)
            colors = [
                jnp.maximum(0.5 + SH_C0 * col(_SH0 + ch * K), 0.0)
                for ch in range(3)
            ]

            # quantized sort (straight-through)
            gated_t = jnp.where(a > 0.0, t_event, jnp.inf)
            t_min_c = jnp.min(gated_t)
            t_max_c = jnp.max(jnp.where(a > 0.0, t_event, -jnp.inf))
            t_rng = jnp.maximum(t_max_c - t_min_c, 1e-20)
            tq = jnp.clip(
                (t_event - t_min_c) * (65534.0 / t_rng), 0.0, 65534.0
            ).astype(jnp.int32)
            src = jax.lax.broadcasted_iota(jnp.int32, (c, R), 0)
            zbase = jnp.int32(65535 << 8)
            skey = jnp.where(a > 0.0, jax.lax.shift_left(tq, 8), zbase) | src
            skey = jax.lax.stop_gradient(skey)
            # straight-through quantized payload values (trunc, as the
            # kernel's astype(int32) does)
            cols_q = [
                _st(
                    jnp.broadcast_to(cc, (c, R)),
                    jnp.floor(jnp.clip(jnp.broadcast_to(cc, (c, R)) * 255.75,
                                       0.0, 1023.0)) * (1.0 / 255.75),
                )
                for cc in colors
            ]
            a_q = a  # alpha rides the sort as an exact float payload now

            # always sort: when the kernel skips (no inversions among
            # significant hits) the sorted result is value-identical
            if cfg.order == "window":
                _, (a_s, c0, c1, c2) = _bitonic_jnp(skey, (a_q, *cols_q), c)
            else:  # key order: no quantization, no sort
                a_s, (c0, c1, c2) = a, [jnp.broadcast_to(x, (c, R))
                                        for x in colors]
            lp = jnp.log1p(-a_s)
            S = jnp.cumsum(lp, axis=0) - lp
            P = t_carry * jnp.exp(S)
            p_incl = P * (1.0 - a_s)
            w = a_s * P * (P > cfg.min_transmittance)
            upd = jnp.concatenate(
                [jnp.sum(w * cx, axis=0, keepdims=True) for cx in (c0, c1, c2)],
                axis=0,
            )
            acc = jnp.where(active, acc + upd, acc)
            below = p_incl <= cfg.min_transmittance
            frozen = jnp.max(
                jnp.where(below, p_incl, -jnp.inf), axis=0, keepdims=True
            )
            p_last = p_incl[c - 1 : c, :]
            t_next = jnp.where(
                jnp.any(below, axis=0, keepdims=True), frozen, p_last
            )
            t_next = jnp.where(
                t_carry > cfg.min_transmittance, t_next, t_carry
            )
            t_carry = jnp.where(active, t_next, t_carry)
        rgb_out.append(jnp.transpose(acc, (1, 0)))
        t_out.append(t_carry[0])
    return jnp.stack(rgb_out), jnp.stack(t_out)


_MY_, _MZ_ = 1, 2


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", default="window")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--wh", default="32x16")
    ap.add_argument("--chunk", type=int, default=32)
    args = ap.parse_args()
    cfg = RenderConfig(
        hit_multiplicity=1, order=args.order, max_per_tile=4096,
        min_transmittance=1e-8, march_chunk=args.chunk,
    )
    c = args.chunk
    W_, H_ = (int(x) for x in args.wh.split("x"))
    scene = random_scene(args.n, seed=6)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=W_, height=H_)
    stream, pair_feats, _, _ = prepare_pair_stream(scene, cam, cfg, 50_000, c)
    origins, dirs, valid = generate_rays(cam, cfg)
    dirs_t = tile_rays(dirs, cfg.tile_w, cfg.tile_h)
    tx_n, ty_n = num_tiles(cam, cfg)
    T = tx_n * ty_n
    R = cfg.rays_per_tile
    eye = cam.eye.astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    W = jax.random.normal(key, (T, R, 3))

    def loss_kernel(feats):
        rgb, tf = march_stream_diff(
            stream.starts, eye, feats, dirs_t, cfg, T, R, c, True
        )
        return jnp.sum(rgb * W)

    def loss_replica(feats):
        rgb, tf = replica_march(
            stream.starts, eye, feats, dirs_t, cfg, T, R, c
        )
        return jnp.sum(rgb * W)

    lk = float(loss_kernel(pair_feats))
    lr = float(loss_replica(pair_feats))
    print(f"forward kernel={lk:.6f} replica={lr:.6f} diff={abs(lk-lr):.2e}")

    gk = jax.grad(loss_kernel)(pair_feats)
    gr = jax.grad(loss_replica)(pair_feats)
    gk, gr = np.asarray(gk), np.asarray(gr)
    # compare only columns the kernel writes (0..14+3K)
    Fw = _SH0 + 3 * num_coeffs(cfg.sh_degree)
    gk, gr = gk[:, :Fw], gr[:, :Fw]
    scale = np.abs(gr).max() + 1e-12
    diff = np.abs(gk - gr)
    print(f"grad max|ref|={scale:.3e} max|diff|={diff.max():.3e} "
          f"rel={diff.max()/scale:.3e}")
    bad = np.argwhere(diff > 1e-3 * scale)
    print(f"entries above 1e-3 rel: {len(bad)}")
    for i, jcol in bad[:10]:
        print(f"  row {i} col {jcol}: kernel={gk[i,jcol]:.6e} "
              f"replica={gr[i,jcol]:.6e}")


if __name__ == "__main__":
    main()
