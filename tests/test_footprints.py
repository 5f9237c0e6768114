"""Exact projected-conic footprint bboxes (ops/tiles.project_footprints_conic).

Two properties pin the design down:
  1. Containment (correctness): every pixel whose ray intersects a
     gaussian's adaptive iso-ellipsoid (the alpha_min iso-surface,
     src/GaussianTracer.cpp:306) lies inside that gaussian's footprint
     rect. A miss here would silently drop visible contributions.
  2. Losslessness (design claim): with order="key" the rendered image is
     unchanged when the tighter exact bboxes replace the conservative
     rects — the march's strict alpha > alpha_min gate
     (shaders/tracer.cuh:361) already zeroes everything outside the
     iso-ellipsoid, so the extra pairs the conservative rect emits are
     pure no-ops.
"""

import numpy as np
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.models.tiled import feature_table
from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
from gaussian_ray_tracing_tpu.ops.tiles import project_footprints_conic
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene


def _camera(w=96, h=64):
    return Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=w, height=h
    )


class TestConicBBox:
    def test_containment(self):
        """All iso-ellipsoid-hitting pixels lie inside the exact bbox."""
        scene = random_scene(400, seed=3)
        cam = _camera()
        config = RenderConfig(exact_bbox=True)
        _, M, radius = feature_table(scene, config)
        bound = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound, cam, config
        )
        _, dirs, _ = generate_rays(cam, config)
        H, W = cam.height, cam.width
        d = dirs.reshape(-1, 3)
        dn = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        n_rays = d.shape[0]
        bad = 0
        for g in range(scene.num_gaussians):
            hit, t_in, t_out = ray_ellipsoid_span(
                jnp.broadcast_to(scene.means[g], (n_rays, 3)),
                jnp.broadcast_to(M[g], (n_rays, 3, 3)),
                jnp.broadcast_to(radius[g], (n_rays,)),
                cam.eye,
                dn,
            )
            mask = np.asarray(hit & (t_out > 0)).reshape(H, W)
            ys, xs = np.nonzero(mask)
            if len(xs) == 0:
                continue
            px, py = float(fp.px[g]), float(fp.py[g])
            rx, ry = float(fp.rx[g]), float(fp.ry[g])
            inside = (np.abs(xs + 0.5 - px) <= rx) & (np.abs(ys + 0.5 - py) <= ry)
            bad += int((~inside).sum())
        assert bad == 0

    def test_tighter_and_lossless(self):
        """Exact bboxes emit fewer pairs and an identical key-order image."""
        scene = random_scene(2000, seed=3)
        cam = _camera()
        out = {}
        for eb in (False, True):
            config = RenderConfig(hit_multiplicity=1, order="key", exact_bbox=eb)
            out[eb] = render(scene, cam, config, method="tiled", return_aux=True)
        np.testing.assert_allclose(
            np.asarray(out[False]["rgb"]),
            np.asarray(out[True]["rgb"]),
            atol=1e-5,  # summation-structure ulps only
        )
        assert int(out[True]["aux"]["n_pairs"]) < int(out[False]["aux"]["n_pairs"])


class TestFisheyeSectorCull:
    def test_cull_is_render_exact_and_tighter(self):
        """config.fisheye_cull drops only pairs the march would gate to
        zero anyway: the key-order image is unchanged to float-regroup
        ulps, and a brute-force check confirms every culled (tile,
        gaussian) pair has no pixel whose ray hits the iso-ellipsoid."""
        from gaussian_ray_tracing_tpu.config import CameraModel
        from gaussian_ray_tracing_tpu.models.renderer import render

        cfg = RenderConfig(hit_multiplicity=1, order="key",
                           max_per_tile=4096,
                           camera_model=CameraModel.FISHEYE,
                           chunk_skip_transmittance=1e-3)
        scene = random_scene(3000, seed=7)
        cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                            width=128, height=128)
        a = render(scene, cam, cfg, method="tiled", pair_capacity=400_000)
        b = render(scene, cam, cfg.replace(fisheye_cull=True),
                   method="tiled", pair_capacity=400_000)
        np.testing.assert_allclose(
            np.asarray(b["rgb"]), np.asarray(a["rgb"]), atol=5e-4
        )

    def test_culled_tiles_have_no_live_pixels(self):
        """Brute force on a small scene: per (gaussian, tile) pair the
        sector cull REJECTS, no pixel center in the tile has a ray that
        hits the adaptive iso-ellipsoid."""
        import jax
        from gaussian_ray_tracing_tpu.config import CameraModel
        from gaussian_ray_tracing_tpu.ops.tiles import (
            _tile_rects,
            bin_pairs,
            num_tiles,
        )

        cfg = RenderConfig(hit_multiplicity=1,
                           camera_model=CameraModel.FISHEYE)
        scene = random_scene(300, seed=11)
        cam = Camera.create(eye=(0.0, 0.2, 2.6), lookat=(0.0, 0.0, 0.0),
                            width=128, height=128)
        _, M, radius = feature_table(scene, cfg)
        bound = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound, cam, cfg
        )
        cap = 100_000
        off = bin_pairs(fp, cam, cfg, cap)
        on = bin_pairs(fp, cam, cfg.replace(fisheye_cull=True), cap)
        # pair sets per tile: the cull must only REMOVE pairs
        tx_n, ty_n = num_tiles(cam, cfg)
        off_gid = np.asarray(off.gid)
        on_gid = np.asarray(on.gid)
        off_starts = np.asarray(off.starts)
        on_starts = np.asarray(on.starts)
        _, dirs, _ = generate_rays(cam, cfg)
        d = np.asarray(dirs.reshape(-1, 3))
        nn = np.linalg.norm(d, axis=-1, keepdims=True)
        dn = np.where(nn > 0, d / np.maximum(nn, 1e-12), 0.0)
        order = np.asarray(off.order)
        n_culled = 0
        for t in range(tx_n * ty_n):
            s_off = set(off_gid[off_starts[t]:off_starts[t + 1]].tolist())
            s_on = set(on_gid[on_starts[t]:on_starts[t + 1]].tolist())
            assert s_on <= s_off, f"cull ADDED pairs in tile {t}"
            culled = s_off - s_on
            if not culled:
                continue
            ty, tx = divmod(t, tx_n)
            ys = slice(ty * cfg.tile_h, (ty + 1) * cfg.tile_h)
            xs = slice(tx * cfg.tile_w, (tx + 1) * cfg.tile_w)
            for rank in culled:
                g = int(order[rank])
                hit, t_in, t_out = ray_ellipsoid_span(
                    jnp.broadcast_to(scene.means[g], (d.shape[0], 3)),
                    jnp.broadcast_to(M[g], (d.shape[0], 3, 3)),
                    jnp.broadcast_to(radius[g], (d.shape[0],)),
                    cam.eye, jnp.asarray(dn),
                )
                live = np.asarray(
                    hit & (t_out > 0) & (nn[:, 0] > 0.1)
                ).reshape(128, 128)[ys, xs]
                n_culled += 1
                assert not live.any(), (
                    f"culled pair (tile {t}, gaussian {g}) has live pixels"
                )
        assert n_culled > 0, "cull removed nothing on this scene"


class TestFisheyeConeCaps:
    def test_containment(self):
        """Fisheye: every pixel whose ray hits a gaussian's iso-ellipsoid
        lies inside its footprint rect (exact hit-cone caps + exact
        polar-warp rectangle). The round-3 parity failure mode was
        exactly a miss here (interior holes, 22 dB at 720p)."""
        import pytest as _p

        _p.importorskip("jax")
        from gaussian_ray_tracing_tpu.config import CameraModel

        scene = random_scene(400, seed=3)
        cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=128, height=128)
        config = RenderConfig(camera_model=CameraModel.FISHEYE)
        _, M, radius = feature_table(scene, config)
        bound = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound, cam,
            config,
        )
        _, dirs, _ = generate_rays(cam, config)
        H, W = cam.height, cam.width
        d = dirs.reshape(-1, 3)
        nz = jnp.linalg.norm(d, axis=-1, keepdims=True)
        dn = jnp.where(nz > 0, d / jnp.maximum(nz, 1e-12), 0.0)
        live = nz[:, 0] > 0.1  # blanked r > 1 ring has zero dirs
        n_rays = d.shape[0]
        bad = 0
        for g in range(scene.num_gaussians):
            hit, t_in, t_out = ray_ellipsoid_span(
                jnp.broadcast_to(scene.means[g], (n_rays, 3)),
                jnp.broadcast_to(M[g], (n_rays, 3, 3)),
                jnp.broadcast_to(radius[g], (n_rays,)),
                cam.eye,
                dn,
            )
            mask = np.asarray(hit & (t_out > 0) & live).reshape(H, W)
            ys, xs = np.nonzero(mask)
            if len(xs) == 0:
                continue
            px, py = float(fp.px[g]), float(fp.py[g])
            rx, ry = float(fp.rx[g]), float(fp.ry[g])
            inside = (np.abs(xs + 0.5 - px) <= rx) & (np.abs(ys + 0.5 - py) <= ry)
            bad += int((~inside).sum())
        assert bad == 0
