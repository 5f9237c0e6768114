"""Projected-conic pair culling (ops/tiles.projection_conics +
_conic_rect_cull): the expansion drops (tile, gaussian) pairs whose tile
rect provably cannot contain any ray clearing the alpha_min gate
(tracer.cuh:361 semantics), so renders are unchanged while the march
skips dead bbox-corner pairs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.models.tiled import feature_table
from gaussian_ray_tracing_tpu.ops.response import adaptive_radius
from gaussian_ray_tracing_tpu.ops.tiles import (
    _conic_rect_cull,
    _tile_rects,
    num_tiles,
    project_footprints_conic,
    projection_conics,
)
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

CAM = dict(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0))


def _geom(scene, config):
    _, M, radius = feature_table(scene, config)
    return (scene.means, M.reshape(-1, 9), radius)


class TestSoundness:
    def test_culled_tiles_have_no_live_pixels(self):
        """Brute force: for every (gaussian, tile) pair the cull REJECTS,
        no pixel center in that tile has max ray response above alpha_min
        (the march would have gated the pair to zero weight anyway)."""
        config = RenderConfig(hit_multiplicity=1)
        scene = random_scene(64, seed=11)
        cam = Camera.create(width=128, height=80, **CAM)
        geom = _geom(scene, config)
        means, M9, radius = geom
        gc = [np.asarray(g) for g in projection_conics(geom, cam)]

        bound_radius = np.asarray(radius) * np.max(
            np.asarray(scene.scales), axis=-1
        )
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius,
            jnp.asarray(bound_radius), cam, config,
        )
        x0, y0, sw, count = (np.asarray(v) for v in
                             _tile_rects(fp, cam, config))
        tx_n, ty_n = num_tiles(cam, config)
        tw, th = config.tile_w, config.tile_h

        _, dirs, _ = generate_rays(cam, config)
        dirs = np.asarray(dirs)  # (H, W, 3)
        eye = np.asarray(cam.eye)
        M9 = np.asarray(M9)
        means_np = np.asarray(means)
        rad_np = np.asarray(radius)
        op_np = np.asarray(scene.opacities)

        checked = culled = 0
        for g in range(means_np.shape[0]):
            if count[g] == 0:
                continue
            M = M9[g].reshape(3, 3)
            og = M @ (eye - means_np[g])
            for ty in range(y0[g], y0[g] + count[g] // max(sw[g], 1)):
                for tx in range(x0[g], x0[g] + sw[g]):
                    kx0 = 2.0 * (tx * tw) / cam.width - 1.0
                    kx1 = 2.0 * (tx * tw + tw) / cam.width - 1.0
                    ky0 = 2.0 * (ty * th) / cam.height - 1.0
                    ky1 = 2.0 * (ty * th + th) / cam.height - 1.0
                    dead = bool(
                        _conic_rect_cull(
                            tuple(jnp.float32(c[g]) for c in gc),
                            kx0, kx1, ky0, ky1,
                        )
                    )
                    checked += 1
                    if not dead:
                        continue
                    culled += 1
                    # every pixel center of the tile must be sub-threshold
                    ys = slice(ty * th, min((ty + 1) * th, cam.height))
                    xs = slice(tx * tw, min((tx + 1) * tw, cam.width))
                    d = dirs[ys, xs].reshape(-1, 3)
                    if d.size == 0:
                        continue
                    dg = d @ M.T  # (p, 3)
                    dd = np.maximum((dg * dg).sum(-1), 1e-12)
                    od = dg @ og
                    oo = og @ og
                    pp = oo - od * od / dd  # min Mahalanobis^2 on the line
                    alpha = op_np[g] * np.exp(-0.5 * np.maximum(pp, 0.0))
                    assert np.all(alpha <= config.alpha_min + 1e-5), (
                        f"gaussian {g} tile ({tx},{ty}): culled but max "
                        f"alpha {alpha.max():.4f} > alpha_min"
                    )
        assert checked > 50
        assert culled > 0, "cull never fired on the test scene"

    def test_eye_inside_gaussian_never_culled(self):
        """|o| < 1 makes q positive everywhere: a gaussian enclosing the
        camera must keep every pair (its footprint covers the frame)."""
        config = RenderConfig(hit_multiplicity=1)
        scene = random_scene(1, seed=0)
        scene = scene.replace(
            means=scene.means.at[0].set(jnp.array([0.0, 0.3, 2.8])),  # at eye
            scales=scene.scales.at[0].set(0.5),
            quats=scene.quats.at[0].set(jnp.array([1.0, 0.0, 0.0, 0.0])),
            opacities=scene.opacities.at[0].set(0.9),
        )
        cam = Camera.create(width=64, height=64, **CAM)
        gc = projection_conics(_geom(scene, config), cam)
        dead = _conic_rect_cull(
            tuple(g[0] for g in gc), -1.0, -0.9, -1.0, -0.9
        )
        assert not bool(dead)


class TestRenderEquality:
    @pytest.mark.parametrize("method", ["tiled", "pallas"])
    def test_cull_is_exact_in_key_order(self, method):
        """Culled candidates have zero gated alpha, so in stream (key)
        order the composite is unchanged term-for-term. (Window order is
        NOT bit-stable under the cull: dropping dead candidates shifts
        chunk boundaries and with them the bounded-window approximation —
        quality under the cull is pinned vs the oracle below.)"""
        # chunk_skip pinned exact: the cull shifts chunk boundaries, and at
        # the production skip threshold (0.02 > min_transmittance) shifted
        # boundaries change which tail chunks skip — a bounded-but-nonzero
        # difference this bit-level test is not about
        config = RenderConfig(hit_multiplicity=1, order="key", conic_cull=True,
                              chunk_skip_transmittance=1e-3)
        scene = random_scene(2500, seed=7)
        cam = Camera.create(width=96, height=64, **CAM)
        on = np.asarray(
            render(scene, cam, config, method=method)["rgb"]
        )
        off = np.asarray(
            render(scene, cam, config.replace(conic_cull=False),
                   method=method)["rgb"]
        )
        # tolerance: removing a == 0 terms regroups the prefix-sum
        # reductions, so isolated pixels move by f32 rounding only
        np.testing.assert_allclose(on, off, atol=5e-4)

    def test_window_quality_holds_with_cull(self):
        """The production config (window order) must stay parity-grade vs
        the exact oracle with the cull on — and not degrade vs cull off."""
        from gaussian_ray_tracing_tpu.utils.image import psnr

        config = RenderConfig(hit_multiplicity=1, order="window",
                              march_chunk=64, conic_cull=True)
        scene = random_scene(2500, seed=7)
        cam = Camera.create(width=96, height=64, **CAM)
        ref = np.asarray(render(scene, cam, config, method="oracle")["rgb"])
        on = np.asarray(render(scene, cam, config, method="tiled")["rgb"])
        off = np.asarray(
            render(scene, cam, config.replace(conic_cull=False),
                   method="tiled")["rgb"]
        )
        p_on = float(psnr(ref, on))
        p_off = float(psnr(ref, off))
        assert p_on >= 40.0, f"culled window PSNR {p_on:.1f} < 40"
        assert p_on >= p_off - 1.0, (p_on, p_off)

    def test_cull_actually_drops_pairs(self):
        from gaussian_ray_tracing_tpu.ops.tiles import bin_pairs

        config = RenderConfig(hit_multiplicity=1, conic_cull=True)
        scene = random_scene(2500, seed=7)
        cam = Camera.create(width=96, height=64, **CAM)
        geom = _geom(scene, config)
        bound_radius = geom[2] * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, geom[2], bound_radius,
            cam, config,
        )
        cap = 1 << 16
        on = bin_pairs(fp, cam, config, cap, geom=geom)
        off = bin_pairs(fp, cam, config.replace(conic_cull=False), cap,
                        geom=geom)
        live_on = int(on.starts[-1])
        live_off = int(off.starts[-1])
        assert live_on < live_off, (live_on, live_off)


class TestRowSpanExpansion:
    """3-zone row-span expansion (config.row_span): edge rows emit only
    their exact conic x-span, so dead pairs are never emitted at all."""

    def test_drops_pairs_and_renders_equal(self):
        from gaussian_ray_tracing_tpu.models.renderer import render

        scene = random_scene(2500, seed=7)
        cam = Camera.create(width=96, height=64, **CAM)
        cfg = RenderConfig(hit_multiplicity=1, order="key")
        off = render(scene, cam, cfg.replace(row_span=False), method="tiled",
                     return_aux=True)
        on = render(scene, cam, cfg.replace(row_span=True), method="tiled",
                    return_aux=True)
        assert int(on["aux"]["n_pairs"]) < int(off["aux"]["n_pairs"])
        assert int(on["aux"]["n_dropped"]) == 0
        np.testing.assert_allclose(
            np.asarray(on["rgb"]), np.asarray(off["rgb"]), atol=5e-4
        )

    def test_span_soundness_brute_force(self):
        """Every (gaussian, tile) pair present under the rect expansion but
        absent under row_span must have NO pixel center whose ray clears
        alpha_min for that gaussian (same bar as the conic cull)."""
        import jax.numpy as jnp

        from gaussian_ray_tracing_tpu.cameras import generate_rays
        from gaussian_ray_tracing_tpu.ops.response import (
            adaptive_radius,
            max_response,
        )
        from gaussian_ray_tracing_tpu.ops.tiles import bin_pairs

        config = RenderConfig(hit_multiplicity=1, row_span=True)
        scene = random_scene(600, seed=11)
        cam = Camera.create(width=96, height=64, **CAM)
        geom = _geom(scene, config)
        radius = geom[2]
        bound_radius = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound_radius,
            cam, config,
        )
        cap = 1 << 15
        on = bin_pairs(fp, cam, config, cap, geom=geom)
        off = bin_pairs(fp, cam, config.replace(row_span=False), cap,
                        geom=geom)
        assert int(on.n_dropped) == 0 and int(off.n_dropped) == 0

        def pair_set(stream):
            gid = np.asarray(stream.gid)
            order = np.asarray(stream.order)
            starts = np.asarray(stream.starts)
            pairs = set()
            for t in range(len(starts) - 1):
                for p in range(starts[t], starts[t + 1]):
                    pairs.add((t, int(order[gid[p]])))
            return pairs

        removed = pair_set(off) - pair_set(on)
        assert len(removed) > 0, "row_span culled nothing on the test scene"
        assert pair_set(on) <= pair_set(off)

        _, dirs, _ = generate_rays(cam, config)
        dirs = np.asarray(dirs)
        tx_n, ty_n = num_tiles(cam, config)
        tw, th = config.tile_w, config.tile_h
        M = np.asarray(_geom(scene, config)[1]).reshape(-1, 3, 3)
        means = np.asarray(scene.means)
        ops = np.asarray(scene.opacities)
        eye = np.asarray(cam.eye)
        checked = 0
        for t, g in sorted(removed)[:4000]:
            ty, tx = divmod(t, tx_n)
            tile_dirs = dirs[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            d = tile_dirs.reshape(-1, 3)
            og = (eye - means[g]) @ M[g].T
            dg = d @ M[g].T
            dd = np.maximum((dg * dg).sum(-1), 1e-12)
            od = (og * dg).sum(-1)
            pp = np.maximum((og * og).sum(-1) - od * od / dd, 0.0)
            alpha = ops[g] * np.exp(-0.5 * pp)
            assert alpha.max() <= config.alpha_min + 1e-6, (
                t, g, float(alpha.max())
            )
            checked += 1
        assert checked > 50
