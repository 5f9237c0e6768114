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
