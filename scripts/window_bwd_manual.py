"""Debug: manual (numpy-level) window backward for ONE tile / ONE chunk vs
the kernel's gradient and the replica's autodiff gradient — pinpoints which
term of the hand-written window backward is wrong.

Usage: JAX_PLATFORMS=cpu python scripts/window_bwd_manual.py
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
from scripts.window_bwd_replica import _bitonic_jnp, replica_march

INT_MAX = jnp.int32(2147483647)


def main():
    cfg = RenderConfig(
        hit_multiplicity=1, order="window", max_per_tile=4096,
        min_transmittance=1e-8, march_chunk=64,
    )
    c = 64
    scene = random_scene(30, seed=6)
    cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                        width=16, height=8)
    stream, pair_feats, _, _ = prepare_pair_stream(scene, cam, cfg, 50_000, c)
    origins, dirs, valid = generate_rays(cam, cfg)
    dirs_t = tile_rays(dirs, cfg.tile_w, cfg.tile_h)
    tx_n, ty_n = num_tiles(cam, cfg)
    T = tx_n * ty_n
    R = cfg.rays_per_tile
    assert T == 1, T
    n = int(np.asarray(stream.starts)[1])
    assert n <= c, (n, c)
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

    gk = np.asarray(jax.grad(loss_kernel)(pair_feats))
    gr = np.asarray(jax.grad(loss_replica)(pair_feats))

    # ---- manual forward/backward for the single chunk -------------------
    f32 = jnp.float32
    g = pair_feats[:c]
    dirs = dirs_t[0]
    dx = dirs[:, 0][None, :]
    dy = dirs[:, 1][None, :]
    dz = dirs[:, 2][None, :]
    live = dx * dx + dy * dy + dz * dz > 0.01
    t_lo = jnp.full((1, R), cfg.t_min, f32)
    t_hi = jnp.full((1, R), cfg.t_max, f32)
    cand_idx = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)
    col = lambda k: g[:, k : k + 1]
    m = [col(_M0 + k) for k in range(9)]
    op = col(_OP)
    rad = col(_RAD)
    ox = eye[0] - col(_MX)
    oy = eye[1] - col(1)
    oz = eye[2] - col(2)
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
    present = cand_idx < n
    gate = present & (disc >= 0.0) & in_window & live & (alpha > cfg.alpha_min)
    a = jnp.where(gate, alpha, 0.0)
    colors = [
        jnp.maximum(0.5 + SH_C0 * col(_SH0 + ch), 0.0) for ch in range(3)
    ]

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
    qz = lambda x: jnp.clip(x * 255.75, 0.0, 1023.0).astype(jnp.int32)
    cpack = (
        jax.lax.shift_left(qz(colors[0]), 20)
        | jax.lax.shift_left(qz(colors[1]), 10)
        | qz(colors[2])
    )
    cpack = jnp.broadcast_to(cpack, (c, R))
    skey_s, (cpack_s, a_s) = _bitonic_jnp(skey, (cpack, jnp.broadcast_to(a, (c, R))), c)
    src_s = skey_s & 255
    unq = lambda x: x.astype(f32) * (1.0 / 255.75)
    mask10 = jnp.int32(1023)
    colors_s = [
        unq(jax.lax.shift_right_logical(cpack_s, 20) & mask10),
        unq(jax.lax.shift_right_logical(cpack_s, 10) & mask10),
        unq(cpack_s & mask10),
    ]
    tri_lo = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    ).astype(f32)
    tri_up = tri_lo.T
    t_in = jnp.ones((1, R), f32)
    lp = jnp.log1p(-a_s)
    S = tri_lo @ lp
    E = jnp.exp(S)
    P = t_in * E
    gate_w = (P > cfg.min_transmittance).astype(f32)
    w_s = a_s * P * gate_w
    dR = [jnp.transpose(W[0])[ch : ch + 1, :] for ch in range(3)]
    d_w = dR[0] * colors_s[0] + dR[1] * colors_s[1] + dR[2] * colors_s[2]
    d_a_s = d_w * P * gate_w
    d_P = d_w * a_s * gate_w
    dT = jnp.zeros((1, R), f32)
    d_lp = dT + tri_up @ (d_P * P)
    d_a_s = d_a_s - d_lp / (1.0 - a_s)
    _, (d_a, w_u) = _bitonic_jnp(src_s, (d_a_s, w_s), c)

    # opacity grad
    d_alpha = jnp.where(gate, d_a, 0.0)
    notclamp = (resp * op < cfg.alpha_clamp).astype(f32)
    d_op_manual = jnp.sum(d_alpha * resp * notclamp, axis=1)

    print("per-row opacity grads (first n rows):")
    print("  manual :", np.asarray(d_op_manual)[:n])
    print("  kernel :", gk[:n, _OP])
    print("  replica:", gr[:n, _OP])


if __name__ == "__main__":
    main()
