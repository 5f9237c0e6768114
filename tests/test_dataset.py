"""NeRF-synthetic dataset loader (scene/dataset.py): camera-convention
round trip and an end-to-end mini fit."""

import json
import os

import jax.numpy as jnp
import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.scene.dataset import load_nerf_synthetic
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8, write_png

CFG = RenderConfig(hit_multiplicity=1)


def _c2w(cam: Camera) -> np.ndarray:
    """Blender/OpenGL camera-to-world from our look-at camera."""
    eye = np.asarray(cam.eye, np.float64)
    fwd = np.asarray(cam.lookat, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up0 = np.asarray(cam.up, np.float64)
    right = np.cross(fwd, up0)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, -fwd, eye
    return m


def _write_dataset(tmpdir, scene, cams):
    import math

    frames = []
    for i, cam in enumerate(cams):
        img = np.asarray(render_tiled(scene, cam, CFG)["rgb"])
        name = f"r_{i}"
        write_png(os.path.join(tmpdir, name + ".png"), quantize_rgb8(img))
        frames.append({
            "file_path": name,
            "transform_matrix": _c2w(cam).tolist(),
        })
    fov_y = math.radians(cams[0].fov_y_deg)
    cam_angle_x = 2.0 * math.atan(math.tan(fov_y / 2.0) * cams[0].aspect)
    with open(os.path.join(tmpdir, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": cam_angle_x, "frames": frames}, f)


class TestNerfSyntheticLoader:
    def test_camera_roundtrip_and_fit(self, tmp_path):
        scene = random_scene(400, seed=0)
        cams = [
            Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                          width=64, height=48),
            Camera.create(eye=(2.0, 0.4, 1.5), lookat=(0.0, 0.0, 0.0),
                          width=64, height=48),
        ]
        _write_dataset(str(tmp_path), scene, cams)
        views, meta = load_nerf_synthetic(str(tmp_path))
        assert len(views) == 2
        for (cam_l, img), cam in zip(views, cams):
            assert img.shape == (48, 64, 3)
            _, d0, _ = generate_rays(cam, CFG)
            _, d1, _ = generate_rays(cam_l, CFG)
            np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-5)
            # target equals the rendered frame up to RGB8 quantization
            ref = np.asarray(render_tiled(scene, cam, CFG)["rgb"])
            assert float(np.abs(img - np.clip(ref, 0, 1)).max()) < 1.0 / 255.0 + 1e-3
        assert meta["extent"] > 0

        # a couple of train steps run end to end on the loaded views
        from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
        from gaussian_ray_tracing_tpu.train.trainer import Trainer

        init = random_scene(100, seed=1)
        tr = Trainer(GaussianModel.from_scene(init), config=CFG, lr=5e-3)
        losses = tr.fit([(c, jnp.asarray(i)) for c, i in views], steps=3)
        assert np.isfinite(losses).all()
