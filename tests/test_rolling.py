"""Rolling-shutter rendering (models/rolling.py)."""

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera, lerp_camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.oracle import render_oracle
from gaussian_ray_tracing_tpu.models.rolling import (
    render_rolling_oracle,
    render_rolling_pallas,
)
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.utils.image import psnr

CFG = RenderConfig(hit_multiplicity=1)


def _cams(w=64, h=32):
    c0 = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                       width=w, height=h)
    c1 = Camera.create(eye=(0.25, 0.25, 2.8), lookat=(0.0, 0.0, 0.0),
                       width=w, height=h)
    return c0, c1


class TestRollingShutter:
    def test_static_equals_global_shutter(self):
        scene = random_scene(800, seed=2)
        c0, _ = _cams()
        rolled = render_rolling_oracle(scene, c0, c0, CFG)
        fixed = render_oracle(scene, c0, CFG)
        np.testing.assert_allclose(
            np.asarray(rolled["rgb"]), np.asarray(fixed["rgb"]), atol=1e-6
        )

    def test_rows_match_per_row_pose(self):
        """Row y of the rolling render equals row y of a global-shutter
        render at the row's interpolated pose — the defining property."""
        scene = random_scene(800, seed=2)
        c0, c1 = _cams()
        rolled = np.asarray(render_rolling_oracle(scene, c0, c1, CFG)["rgb"])
        H = c0.height
        for y in (0, H // 2, H - 1):
            cam_y = lerp_camera(c0, c1, y / (H - 1))
            ref = np.asarray(render_oracle(scene, cam_y, CFG)["rgb"])
            np.testing.assert_allclose(rolled[y], ref[y], atol=1e-5)

    def test_pallas_path_matches_oracle(self):
        scene = random_scene(800, seed=2)
        c0, c1 = _cams()
        cfg = CFG.replace(order="window")
        a = render_rolling_oracle(scene, c0, c1, cfg)
        b = render_rolling_pallas(scene, c0, c1, cfg)
        assert float(psnr(a["rgb"], b["rgb"])) > 38.0

    def test_fisheye_rows_match_per_row_pose(self):
        """Fisheye rolling shutter (closes the round-1 capability gap):
        row identity vs the per-row-pose global-shutter fisheye oracle."""
        from gaussian_ray_tracing_tpu.config import CameraModel

        scene = random_scene(800, seed=2)
        c0, c1 = _cams(w=48, h=48)
        cfg = CFG.replace(camera_model=CameraModel.FISHEYE)
        rolled = np.asarray(render_rolling_oracle(scene, c0, c1, cfg)["rgb"])
        H = c0.height
        for y in (0, H // 2, H - 1):
            cam_y = lerp_camera(c0, c1, y / (H - 1))
            ref = np.asarray(render_oracle(scene, cam_y, cfg)["rgb"])
            np.testing.assert_allclose(rolled[y], ref[y], atol=1e-5)

    def test_fisheye_pallas_path_matches_oracle(self):
        from gaussian_ray_tracing_tpu.config import CameraModel

        scene = random_scene(800, seed=2)
        c0, c1 = _cams(w=48, h=48)
        cfg = CFG.replace(camera_model=CameraModel.FISHEYE, order="window")
        a = render_rolling_oracle(scene, c0, c1, cfg)
        b = render_rolling_pallas(scene, c0, c1, cfg)
        assert float(psnr(a["rgb"], b["rgb"])) > 38.0
