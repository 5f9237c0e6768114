"""Multi-view training datasets.

Loads the standard NeRF-synthetic / Blender `transforms*.json` layout
(the dataset format 3DGS and 3DGRT train on) into (Camera, target image)
pairs consumable by train.Trainer.fit. The reference has no training and
no dataset IO (README.md:2); this closes the loop from captured data to
a fitted PLY the reference's viewer could load.
"""

from __future__ import annotations

import json
import os

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera


def _camera_from_c2w(c2w: np.ndarray, fov_y_deg: float, width: int,
                     height: int) -> Camera:
    """NeRF/Blender camera-to-world (OpenGL: looks down -Z, +Y up)."""
    eye = c2w[:3, 3]
    forward = -c2w[:3, 2]
    up = c2w[:3, 1]
    return Camera.create(
        eye=eye, lookat=eye + forward, up=up,
        fov_y_deg=fov_y_deg, width=width, height=height,
    )


def load_nerf_synthetic(
    root: str,
    split: str = "train",
    downscale: int = 1,
    white_background: bool = True,
    max_views: int | None = None,
):
    """Load `<root>/transforms_<split>.json` (or plain transforms.json).

    Returns (views, meta): views = list[(Camera, (H, W, 3) float32 in
    [0, 1])]; meta = {"center": (3,), "extent": float} from the camera
    positions (for initializing a fit).
    """
    from PIL import Image

    path = os.path.join(root, f"transforms_{split}.json")
    if not os.path.exists(path):
        path = os.path.join(root, "transforms.json")
    with open(path) as f:
        meta_json = json.load(f)

    cam_angle_x = float(meta_json["camera_angle_x"])
    views = []
    eyes = []
    frames = meta_json["frames"]
    if max_views is not None:
        frames = frames[:max_views]
    for fr in frames:
        fp = fr["file_path"]
        img_path = os.path.join(root, fp)
        if not os.path.splitext(img_path)[1]:
            img_path += ".png"
        img = Image.open(img_path)
        if downscale > 1:
            img = img.resize(
                (img.width // downscale, img.height // downscale),
                Image.LANCZOS,
            )
        arr = np.asarray(img, np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        if arr.shape[-1] == 4:
            rgb, a = arr[..., :3], arr[..., 3:4]
            bg = 1.0 if white_background else 0.0
            arr = rgb * a + bg * (1.0 - a)
        H, W = arr.shape[:2]
        fov_y = np.degrees(
            2.0 * np.arctan(np.tan(cam_angle_x / 2.0) * H / W)
        )
        c2w = np.asarray(fr["transform_matrix"], np.float32)
        cam = _camera_from_c2w(c2w, float(fov_y), W, H)
        views.append((cam, arr[..., :3]))
        eyes.append(c2w[:3, 3])

    eyes = np.stack(eyes)
    center = eyes.mean(axis=0)
    extent = float(np.linalg.norm(eyes - center, axis=-1).max())
    return views, {"center": center, "extent": extent}
