"""Camera ray generation, scene activations, PLY round-trip, mesh geometry."""

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera, generate_rays
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.scene.ply import load_ply, save_ply
from gaussian_ray_tracing_tpu.scene.mesh import make_plane, make_sphere, load_obj, merge_meshes
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene


class TestCamera:
    def _cam(self, w=64, h=48):
        return Camera.create(eye=(0, 0, 3), lookat=(0, 0, 0), width=w, height=h)

    def test_uvw_frame(self):
        """Oracle transcription of Camera::UVWFrame (Camera.cpp:3-14)."""
        cam = self._cam()
        U, V, W = cam.uvw_frame()
        np.testing.assert_allclose(W, [0, 0, -3], atol=1e-6)
        wlen = 3.0
        vlen = wlen * np.tan(np.deg2rad(30.0))
        np.testing.assert_allclose(np.linalg.norm(V), vlen, rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(U), vlen * (64 / 48), rtol=1e-5)
        # orthogonality
        assert abs(float(U @ V)) < 1e-5
        assert abs(float(U @ W)) < 1e-5

    def test_pinhole_center_ray(self):
        cam = self._cam()
        _, dirs, valid = generate_rays(cam, RenderConfig())
        # center pixels look along W = -z
        center = np.asarray(dirs[24, 32])
        assert center[2] < -0.99
        assert bool(valid.all())

    def test_pinhole_ndc_oracle(self):
        """Directions match the raygen formula (tracer.cuh:115-134 with
        negated U, V per tracer.cu:37-38)."""
        cam = self._cam()
        cfg = RenderConfig()
        _, dirs, _ = generate_rays(cam, cfg)
        U, V, W = (np.asarray(a) for a in cam.uvw_frame())
        x, y = 7, 11
        d = 2.0 * np.array([(x + 0.5) / 64, (y + 0.5) / 48]) - 1.0
        expected = d[0] * (-U) + d[1] * (-V) + W
        expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(np.asarray(dirs[y, x]), expected, atol=1e-6)

    def test_fisheye_blanks_corners(self):
        cam = self._cam(64, 64)
        cfg = RenderConfig(camera_model=CameraModel.FISHEYE)
        _, dirs, valid = generate_rays(cam, cfg)
        assert not bool(valid[0, 0])  # corner r > 1
        assert bool(valid[32, 32])
        np.testing.assert_allclose(np.asarray(dirs[0, 0]), 0.0)

    def test_fisheye_center_matches_axis(self):
        cam = self._cam(65, 65)
        cfg = RenderConfig(camera_model=CameraModel.FISHEYE)
        _, dirs, _ = generate_rays(cam, cfg)
        center = np.asarray(dirs[32, 32])
        np.testing.assert_allclose(center, [0, 0, -1], atol=1e-2)

    def test_fisheye_equisolid_oracle(self):
        """Transcription of getFishEyeRay (tracer.cuh:136-165): equisolid
        theta = 2 asin(r / 2f), f = 1/sqrt(2), composed with the SCALED
        (-U, -V, W) basis like the reference raygen."""
        cam = self._cam(256, 256)
        cfg = RenderConfig(camera_model=CameraModel.FISHEYE)
        _, dirs, valid = generate_rays(cam, cfg)
        U, V, W = (np.asarray(a) for a in cam.uvw_frame())
        y, x = 128, 192
        dx = 2 * (x + 0.5) / 256 - 1
        dy = 2 * (y + 0.5) / 256 - 1
        r = np.hypot(dx, dy)
        theta = 2 * np.arcsin(r / (2 * cfg.fisheye_focal))
        phi = np.arctan2(dy, dx)
        local = np.array(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]
        )
        expected = local[0] * (-U) + local[1] * (-V) + local[2] * W
        expected /= np.linalg.norm(expected)
        np.testing.assert_allclose(np.asarray(dirs[y, x]), expected, atol=1e-5)


class TestScene:
    def test_activations(self):
        """Load-time activations (GaussianData.cpp:101-112)."""
        means = np.zeros((2, 3))
        raw_scales = np.log([[0.1, 0.2, 0.3], [1.0, 1.0, 1.0]])
        raw_quats = np.array([[2.0, 0, 0, 0], [1.0, 1.0, 0, 0]])
        raw_op = np.array([0.0, 2.0])
        sh = np.zeros((2, 16, 3))
        s = GaussianScene.from_raw(means, raw_scales, raw_quats, raw_op, sh, pad_to=2)
        np.testing.assert_allclose(s.scales[0], [0.1, 0.2, 0.3], rtol=1e-5)
        np.testing.assert_allclose(s.quats[0], [1, 0, 0, 0], atol=1e-6)
        np.testing.assert_allclose(s.quats[1], [np.sqrt(0.5), np.sqrt(0.5), 0, 0], atol=1e-6)
        np.testing.assert_allclose(s.opacities, [0.5, 1 / (1 + np.exp(-2))], rtol=1e-5)

    def test_padding_invisible(self):
        s = random_scene(10, pad_to=256)
        assert s.num_gaussians == 256 and s.num_active == 10
        np.testing.assert_allclose(s.opacities[10:], 0.0)

    def test_center(self):
        s = random_scene(100, seed=1)
        np.testing.assert_allclose(
            np.asarray(s.center()), np.asarray(s.means[:100]).mean(0), atol=1e-4
        )

    def test_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(5)
        n = 17
        means = rng.normal(size=(n, 3)).astype(np.float32)
        raw_scales = rng.normal(size=(n, 3)).astype(np.float32)
        raw_quats = rng.normal(size=(n, 4)).astype(np.float32)
        raw_op = rng.normal(size=(n,)).astype(np.float32)
        sh = rng.normal(size=(n, 16, 3)).astype(np.float32)
        p = str(tmp_path / "test.ply")
        save_ply(p, means, raw_scales, raw_quats, raw_op, sh)
        scene = load_ply(p)
        assert scene.num_active == n
        np.testing.assert_allclose(scene.means[:n], means, rtol=1e-6)
        np.testing.assert_allclose(scene.scales[:n], np.exp(raw_scales), rtol=1e-5)
        np.testing.assert_allclose(scene.opacities[:n], 1 / (1 + np.exp(-raw_op)), rtol=1e-5)
        norm = raw_quats / np.linalg.norm(raw_quats, axis=-1, keepdims=True)
        np.testing.assert_allclose(scene.quats[:n], norm, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(scene.sh[:n], sh, rtol=1e-6)


class TestMesh:
    def test_plane(self):
        m = make_plane()
        assert m.num_faces == 2
        v = np.asarray(m.world_vertices())
        np.testing.assert_allclose(v[:, 0].min(), -0.15, atol=1e-6)
        np.testing.assert_allclose(v[:, 1].max(), 0.25, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.world_normals()), [[0, 0, 1]] * 4)

    def test_sphere(self):
        m = make_sphere(radius=0.3, tess_u=16, tess_v=9)
        v = np.asarray(m.world_vertices())
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 0.3, rtol=1e-5)
        assert m.num_faces == 2 * 16 * 8

    def test_obj_yflip(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text(
            "v 0 1 0\nv 1 2 0\nv 0 1 1\nvn 0 1 0\nf 1//1 2//1 3//1\n"
        )
        m = load_obj(str(p))
        v = np.asarray(m.vertices)
        # reference flips Y of positions and normals (Primitives.cpp:176-181)
        np.testing.assert_allclose(v[:, 1], [-1, -2, -1], atol=1e-6)
        np.testing.assert_allclose(np.asarray(m.normals)[0], [0, -1, 0], atol=1e-6)

    def test_merge(self):
        merged = merge_meshes([make_plane(), make_plane(position=(1, 0, 0))])
        assert merged.num_faces == 4
