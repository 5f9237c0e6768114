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
