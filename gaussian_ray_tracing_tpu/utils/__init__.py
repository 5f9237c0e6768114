"""Utilities: image IO, metrics, timing, logging."""

from gaussian_ray_tracing_tpu.utils.image import quantize_rgb8, write_png, psnr

__all__ = ["quantize_rgb8", "write_png", "psnr"]
