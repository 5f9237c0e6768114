"""Cameras and ray generation (pinhole + equisolid fisheye).

Reproduces the reference camera semantics:
  - UVW basis (src/Camera.cpp:3-14): W = lookat - eye (unnormalized; |W| is
    the focal length), U = normalize(W x up) * ulen, V = normalize(U x W) *
    vlen, vlen = |W| * tan(fovY/2), ulen = vlen * aspect.
  - The raygen program negates U and V before use (shaders/tracer.cu:37-38).
  - Pinhole rays (shaders/tracer.cuh:115-134): NDC d in [-1,1]^2 from pixel
    centers, dir = normalize(d.x*U' + d.y*V' + W) with U' = -U, V' = -V.
  - Fisheye rays (shaders/tracer.cuh:136-165): equisolid r = 2 f sin(theta/2)
    with f = 1/sqrt(2); pixels with r > 1 produce no ray and are blanked to
    black (src/GaussianTracer.cpp:510-513).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """Look-at camera. eye/lookat/up are traced leaves; the rest is static."""

    eye: jnp.ndarray  # (3,)
    lookat: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    fov_y_deg: float = dataclasses.field(default=60.0, metadata=dict(static=True))
    width: int = dataclasses.field(default=1280, metadata=dict(static=True))
    height: int = dataclasses.field(default=720, metadata=dict(static=True))

    @property
    def aspect(self) -> float:
        return self.width / self.height

    @staticmethod
    def create(eye, lookat, up=(0.0, 1.0, 0.0), fov_y_deg=60.0, width=1280, height=720):
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return Camera(f32(eye), f32(lookat), f32(up), float(fov_y_deg), int(width), int(height))

    def uvw_frame(self) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """U, V, W per src/Camera.cpp:3-14 (W unnormalized = focal)."""
        W = self.lookat - self.eye
        wlen = jnp.linalg.norm(W)
        U = _normalize(jnp.cross(W, self.up))
        V = _normalize(jnp.cross(U, W))
        vlen = wlen * jnp.tan(0.5 * jnp.deg2rad(jnp.float32(self.fov_y_deg)))
        ulen = vlen * self.aspect
        return U * ulen, V * vlen, W


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def pixel_ndc(width: int, height: int) -> jnp.ndarray:
    """(H, W, 2) NDC coords d = 2*((px+0.5)/W, (py+0.5)/H) - 1 (tracer.cuh:126-130)."""
    xs = (np.arange(width, dtype=np.float32) + 0.5) / width
    ys = (np.arange(height, dtype=np.float32) + 0.5) / height
    dx = 2.0 * xs - 1.0
    dy = 2.0 * ys - 1.0
    return jnp.asarray(np.stack(np.meshgrid(dx, dy, indexing="xy"), axis=-1))


def distort_opencv(x: jnp.ndarray, y: jnp.ndarray, dist: tuple):
    """Forward OpenCV distortion on normalized camera coords (x = X/Z).

    dist = (k1, k2, p1, p2[, k3[, k4, k5, k6]]) — the OPENCV /
    OPENCV_FISHEYE-style radial+tangential model 3DGRUT supports (the
    reference has pinhole and equisolid fisheye only, tracer.cuh:115-165).
    """
    k1, k2, p1, p2, k3, k4, k5, k6 = (tuple(dist) + (0.0,) * 8)[:8]
    r2 = x * x + y * y
    num = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    den = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
    cdist = num / den
    xy2 = 2.0 * x * y
    xd = x * cdist + p1 * xy2 + p2 * (r2 + 2.0 * x * x)
    yd = y * cdist + p1 * (r2 + 2.0 * y * y) + p2 * xy2
    return xd, yd


def undistort_opencv(xd: jnp.ndarray, yd: jnp.ndarray, dist: tuple,
                     iters: int = 8):
    """Invert distort_opencv by fixed-point iteration (cv2.undistortPoints
    scheme): ideal = (distorted - tangential(ideal)) / cdist(ideal)."""
    k1, k2, p1, p2, k3, k4, k5, k6 = (tuple(dist) + (0.0,) * 8)[:8]
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        num = 1.0 + r2 * (k4 + r2 * (k5 + r2 * k6))
        den = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        icdist = num / jnp.maximum(den, 1e-9)
        xy2 = 2.0 * x * y
        dx = p1 * xy2 + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + p2 * xy2
        x = (xd - dx) * icdist
        y = (yd - dy) * icdist
    return x, y


def generate_rays(camera: Camera, config: RenderConfig):
    """All primary rays of a frame.

    Returns:
      origins: (H, W, 3)
      dirs:    (H, W, 3) normalized; zero vector where no ray exists
      valid:   (H, W) bool; False for fisheye pixels with r > 1 (these are
               blanked to black, matching the reference memset,
               src/GaussianTracer.cpp:510-513)
    """
    U, V, W = camera.uvw_frame()
    Un, Vn = -U, -V  # raygen negates U and V (shaders/tracer.cu:37-38)
    d = pixel_ndc(camera.width, camera.height)
    dx, dy = d[..., 0], d[..., 1]
    if config.camera_model == CameraModel.PINHOLE:
        dirs = dx[..., None] * Un + dy[..., None] * Vn + W
        dirs = _normalize(dirs)
        valid = jnp.ones(dirs.shape[:-1], bool)
    elif config.camera_model == CameraModel.OPENCV:
        # distortion acts on normalized camera coords x_cam = ndc * tan(fov/2)
        wlen = jnp.linalg.norm(W)
        cu = jnp.linalg.norm(U) / wlen
        cv = jnp.linalg.norm(V) / wlen
        xi, yi = undistort_opencv(dx * cu, dy * cv, config.distortion)
        dirs = (xi / cu)[..., None] * Un + (yi / cv)[..., None] * Vn + W
        dirs = _normalize(dirs)
        valid = jnp.ones(dirs.shape[:-1], bool)
    elif config.camera_model == CameraModel.FISHEYE:
        r = jnp.sqrt(dx * dx + dy * dy)
        valid = r <= 1.0
        f = config.fisheye_focal
        theta = 2.0 * jnp.arcsin(jnp.clip(r / (2.0 * f), -1.0, 1.0))
        phi = jnp.arctan2(dy, dx)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        local = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
        dirs = local[..., 0:1] * Un + local[..., 1:2] * Vn + local[..., 2:3] * W
        dirs = jnp.where(valid[..., None], _normalize(dirs), 0.0)
    else:
        raise ValueError(f"unknown camera model {config.camera_model}")
    origins = jnp.broadcast_to(camera.eye, dirs.shape)
    return origins, dirs, valid


def lerp_camera(cam0: Camera, cam1: Camera, t: float) -> Camera:
    """Linear pose interpolation (small inter-frame motion)."""
    lerp = lambda a, b: a + t * (b - a)
    return Camera(
        eye=lerp(cam0.eye, cam1.eye),
        lookat=lerp(cam0.lookat, cam1.lookat),
        up=lerp(cam0.up, cam1.up),
        fov_y_deg=cam0.fov_y_deg,
        width=cam0.width,
        height=cam0.height,
    )


def generate_rays_rolling(cam0: Camera, cam1: Camera, config: RenderConfig):
    """Rolling-shutter primary rays: scanline y is exposed at readout time
    t = y/(H-1), with the camera pose linearly interpolated cam0 -> cam1
    (3DGRUT-style rolling shutter; the reference has a single global
    shutter, shaders/tracer.cu:17-110). Per-ROW poses, vectorized:
    every per-camera scalar of the UVW frame becomes an (H,) array.

    Returns (origins (H, W, 3), dirs (H, W, 3) normalized, valid (H, W)).
    """
    H, Wd = cam0.height, cam0.width
    t = jnp.linspace(0.0, 1.0, H)[:, None]  # (H, 1)
    eye = cam0.eye[None] + t * (cam1.eye - cam0.eye)[None]  # (H, 3)
    lookat = cam0.lookat[None] + t * (cam1.lookat - cam0.lookat)[None]
    up = cam0.up[None] + t * (cam1.up - cam0.up)[None]

    W = lookat - eye  # (H, 3)
    wlen = jnp.linalg.norm(W, axis=-1, keepdims=True)
    U = _normalize(jnp.cross(W, up))
    V = _normalize(jnp.cross(U, W))
    vlen = wlen * jnp.tan(0.5 * jnp.deg2rad(jnp.float32(cam0.fov_y_deg)))
    ulen = vlen * cam0.aspect
    U = U * ulen
    V = V * vlen

    d = pixel_ndc(Wd, H)
    dx, dy = d[..., 0], d[..., 1]  # (H, W)
    if config.camera_model == CameraModel.FISHEYE:
        # equisolid mapping (tracer.cuh:136-165) against per-ROW frames
        r = jnp.sqrt(dx * dx + dy * dy)
        valid = r <= 1.0
        f = config.fisheye_focal
        theta = 2.0 * jnp.arcsin(jnp.clip(r / (2.0 * f), -1.0, 1.0))
        phi = jnp.arctan2(dy, dx)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        lx, ly, lz = st * jnp.cos(phi), st * jnp.sin(phi), ct  # (H, W)
        dirs = (
            lx[..., None] * -U[:, None, :]
            + ly[..., None] * -V[:, None, :]
            + lz[..., None] * W[:, None, :]
        )
        dirs = jnp.where(valid[..., None], _normalize(dirs), 0.0)
        origins = jnp.broadcast_to(eye[:, None, :], dirs.shape)
        return origins, dirs, valid
    if config.camera_model == CameraModel.OPENCV:
        cu = (jnp.linalg.norm(U, axis=-1) / wlen[:, 0])[:, None]
        cv = (jnp.linalg.norm(V, axis=-1) / wlen[:, 0])[:, None]
        xi, yi = undistort_opencv(dx * cu, dy * cv, config.distortion)
        dx, dy = xi / cu, yi / cv
    dirs = (
        dx[..., None] * -U[:, None, :]
        + dy[..., None] * -V[:, None, :]
        + W[:, None, :]
    )
    dirs = _normalize(dirs)
    origins = jnp.broadcast_to(eye[:, None, :], dirs.shape)
    valid = jnp.ones(dirs.shape[:-1], bool)
    return origins, dirs, valid


def orbit_camera(center, radius: float, azimuth_deg: float, elevation_deg: float,
                 **kw) -> Camera:
    """Convenience orbit camera around a scene center."""
    az = np.deg2rad(azimuth_deg)
    el = np.deg2rad(elevation_deg)
    offset = np.array(
        [np.cos(el) * np.sin(az), np.sin(el), np.cos(el) * np.cos(az)],
        dtype=np.float32,
    ) * radius
    center = np.asarray(center, np.float32)
    return Camera.create(eye=center + offset, lookat=center, **kw)
