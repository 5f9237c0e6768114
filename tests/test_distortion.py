"""OPENCV distortion camera model (cameras.distort/undistort_opencv and
the distorted footprint rects). A 3DGRUT-style capability beyond the
reference's pinhole + equisolid fisheye (shaders/tracer.cuh:115-165)."""

import jax.numpy as jnp
import numpy as np

from gaussian_ray_tracing_tpu.cameras import (
    Camera,
    distort_opencv,
    generate_rays,
    undistort_opencv,
)
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.models.tiled import feature_table
from gaussian_ray_tracing_tpu.ops.response import ray_ellipsoid_span
from gaussian_ray_tracing_tpu.ops.tiles import project_footprints_conic
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

DIST = (-0.18, 0.03, 1e-3, -5e-4, 0.004)


def _camera(w=96, h=64):
    return Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=w, height=h
    )


class TestDistortionMath:
    def test_roundtrip(self):
        x = jnp.linspace(-0.6, 0.6, 25)
        y = jnp.linspace(-0.45, 0.45, 25)
        X, Y = jnp.meshgrid(x, y)
        xd, yd = distort_opencv(X, Y, DIST)
        xi, yi = undistort_opencv(xd, yd, DIST)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(X), atol=1e-5)
        np.testing.assert_allclose(np.asarray(yi), np.asarray(Y), atol=1e-5)

    def test_zero_coeffs_is_pinhole(self):
        cam = _camera()
        _, d_pin, _ = generate_rays(cam, RenderConfig())
        _, d_cv, _ = generate_rays(
            cam, RenderConfig(camera_model=CameraModel.OPENCV, distortion=())
        )
        np.testing.assert_allclose(np.asarray(d_cv), np.asarray(d_pin), atol=1e-6)

    def test_distortion_bends_edge_rays(self):
        cam = _camera()
        _, d_pin, _ = generate_rays(cam, RenderConfig())
        cfg = RenderConfig(camera_model=CameraModel.OPENCV, distortion=DIST)
        _, d_cv, _ = generate_rays(cam, cfg)
        center = np.linalg.norm(np.asarray(d_cv[32, 48] - d_pin[32, 48]))
        corner = np.linalg.norm(np.asarray(d_cv[0, 0] - d_pin[0, 0]))
        assert center < 1e-3
        assert corner > 5e-3  # barrel distortion moves the corner rays


class TestDistortedRender:
    def test_footprint_containment(self):
        """Every pixel whose (distorted) ray hits a gaussian's iso
        ellipsoid lies inside its distorted footprint rect."""
        scene = random_scene(300, seed=5)
        cam = _camera()
        cfg = RenderConfig(camera_model=CameraModel.OPENCV, distortion=DIST)
        _, M, radius = feature_table(scene, cfg)
        bound = radius * jnp.max(scene.scales, axis=-1)
        fp = project_footprints_conic(
            scene.means, scene.scales, scene.quats, radius, bound, cam, cfg
        )
        _, dirs, _ = generate_rays(cam, cfg)
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
                cam.eye, dn,
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

    def test_tiled_matches_oracle(self):
        from gaussian_ray_tracing_tpu.models.oracle import render_oracle

        scene = random_scene(1000, seed=3)
        cam = _camera()
        cfg = RenderConfig(hit_multiplicity=1, order="window",
                           camera_model=CameraModel.OPENCV, distortion=DIST)
        a = np.asarray(render_oracle(scene, cam, cfg)["rgb"])
        b = np.asarray(render(scene, cam, cfg, method="tiled")["rgb"])
        mse = np.mean((a - b) ** 2)
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 40.0
