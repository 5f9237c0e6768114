"""Generate a NeRF-synthetic-format multi-view dataset by rendering a
ground-truth gaussian scene (default: data/fitted_20k.ply) from orbit poses.

The container has zero egress, so the standard Blender scenes can't be
fetched; this produces the same `transforms_{split}.json` + PNG layout
(the format 3DGS/3DGRT train on, scene/dataset.load_nerf_synthetic reads
it back) with a DIFFERENT pose distribution per split, so the test split
is genuinely held out. Images are the renderer's natural black-background
RGB (train with white_background=False).

Usage:
  python scripts/make_dataset.py --out data/nerf_fitted \
      --train 100 --test 16 --size 400 [--ply data/fitted_20k.ply]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.ply import load_ply
from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8, write_png

FOV_Y_DEG = 45.0


def _c2w(eye: np.ndarray, lookat: np.ndarray, up=(0.0, 1.0, 0.0)):
    """OpenGL camera-to-world (looks down -Z, +Y up) for transforms.json."""
    fwd = lookat - eye
    fwd = fwd / np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, true_up, -fwd, eye
    return m


def _poses(n: int, radius: float, center: np.ndarray, seed: int,
           elev_range=(-10.0, 45.0)):
    """n poses on a sphere cap: uniform azimuth spiral + jittered elevation."""
    rng = np.random.default_rng(seed)
    poses = []
    for i in range(n):
        az = 2.0 * np.pi * ((i * 0.618034) % 1.0)  # golden-ratio spiral
        el = np.deg2rad(
            elev_range[0] + (elev_range[1] - elev_range[0]) * rng.random()
        )
        r = radius * (0.9 + 0.2 * rng.random())
        eye = center + r * np.array(
            [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)]
        )
        poses.append(_c2w(eye, center))
    return poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", default="data/fitted_20k.ply")
    ap.add_argument("--out", default="data/nerf_fitted")
    ap.add_argument("--train", type=int, default=100)
    ap.add_argument("--test", type=int, default=16)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--radius", type=float, default=2.8)
    args = ap.parse_args()

    scene = jax.device_put(load_ply(args.ply))
    print(f"GT scene: {scene.num_gaussians} gaussians from {args.ply}")
    config = RenderConfig(hit_multiplicity=1)
    method = "pallas" if jax.default_backend() == "tpu" else "tiled"
    center = np.zeros(3)

    cam_angle_x = 2.0 * np.arctan(
        np.tan(np.deg2rad(FOV_Y_DEG) / 2.0)
    )  # square images: fov_x == fov_y

    fn = jax.jit(
        lambda eye, lookat: render(
            scene,
            Camera.create(eye=eye, lookat=lookat, fov_y_deg=FOV_Y_DEG,
                          width=args.size, height=args.size),
            config, method=method,
        )["rgb"],
        static_argnums=(),
    )

    os.makedirs(args.out, exist_ok=True)
    for split, n, seed in (("train", args.train, 0), ("test", args.test, 1),
                           ("val", min(4, args.test), 2)):
        os.makedirs(os.path.join(args.out, split), exist_ok=True)
        frames = []
        for i, c2w in enumerate(_poses(n, args.radius, center, seed)):
            eye = c2w[:3, 3]
            lookat = eye - c2w[:3, 2]
            rgb = np.asarray(
                quantize_rgb8(fn(eye.astype(np.float32),
                                 lookat.astype(np.float32)))
            )
            rel = f"./{split}/r_{i}"
            write_png(os.path.join(args.out, f"{split}/r_{i}.png"), rgb)
            frames.append(
                {"file_path": rel, "transform_matrix": c2w.tolist()}
            )
            if i % 10 == 0:
                print(f"{split} {i}/{n}", flush=True)
        with open(os.path.join(args.out, f"transforms_{split}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": cam_angle_x, "frames": frames}, f, indent=1
            )
    print("dataset written to", args.out)


if __name__ == "__main__":
    main()
