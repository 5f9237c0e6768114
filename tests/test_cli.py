"""CLI command coverage (in-process via cli.main)."""

import json
import os

import numpy as np

from gaussian_ray_tracing_tpu import cli
from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene


def _save_ply(path, n=300, seed=0):
    GaussianModel.from_scene(random_scene(n, seed=seed, pad_to=n)).to_ply(path)
    return path


def test_eval_self_and_other(tmp_path, capsys):
    a = _save_ply(str(tmp_path / "a.ply"), seed=0)
    b = _save_ply(str(tmp_path / "b.ply"), seed=1)
    cli.main(["eval", "-p", a, "--against", a, "--poses", "2",
              "--width", "48", "--height", "32"])
    self_score = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cli.main(["eval", "-p", a, "--against", b, "--poses", "2",
              "--width", "48", "--height", "32"])
    other = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert self_score["psnr_mean"] > 60.0  # identical scenes
    assert other["psnr_mean"] < self_score["psnr_mean"]


def test_render_supersample_cli(tmp_path, capsys):
    out = str(tmp_path / "r.png")
    cli.main(["render", "--synthetic", "300", "--width", "48", "--height",
              "32", "--supersample", "2", "-o", out])
    assert os.path.exists(out)
    assert "48x32" in capsys.readouterr().out


def test_eval_dataset_split(tmp_path, capsys):
    """cli eval --dataset: held-out-split PSNR of a PLY against stored
    images (the novel-view-synthesis evaluation used for dataset fits)."""
    import jax.numpy as jnp

    from gaussian_ray_tracing_tpu.cameras import Camera
    from gaussian_ray_tracing_tpu.config import RenderConfig
    from gaussian_ray_tracing_tpu.models.tiled import render_tiled
    from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8, write_png
    from tests.test_dataset import _c2w

    scene = random_scene(300, seed=0, pad_to=300)
    ply = _save_ply(str(tmp_path / "gt.ply"))  # same seed/scene as below
    cams = [
        Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                      width=64, height=48),
        Camera.create(eye=(2.0, 0.4, 1.5), lookat=(0.0, 0.0, 0.0),
                      width=64, height=48),
    ]
    import json as _json
    import math

    frames = []
    cfg = RenderConfig(hit_multiplicity=1)
    for i, cam in enumerate(cams):
        img = np.asarray(render_tiled(scene, cam, cfg)["rgb"])
        write_png(str(tmp_path / f"r_{i}.png"), quantize_rgb8(img))
        frames.append({"file_path": f"r_{i}",
                       "transform_matrix": _c2w(cam).tolist()})
    fov_y = math.radians(cams[0].fov_y_deg)
    cam_angle_x = 2.0 * math.atan(math.tan(fov_y / 2.0) * cams[0].aspect)
    with open(tmp_path / "transforms_test.json", "w") as f:
        _json.dump({"camera_angle_x": cam_angle_x, "frames": frames}, f)

    cli.main(["eval", "--dataset", str(tmp_path), "--split", "test",
              "--against", ply])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # the PLY IS the scene the images were rendered from: near-exact
    # (PNG quantization + key-order vs itself), far above any fit score
    assert out["views"] == 2
    assert out["psnr_mean"] > 35.0
