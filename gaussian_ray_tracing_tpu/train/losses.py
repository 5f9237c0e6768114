"""Image losses for gaussian fitting.

Includes the standard 3DGS training loss (Kerbl et al.):
0.8 * L1 + 0.2 * (1 - SSIM), with SSIM computed by an 11x11 separable
gaussian window (sigma 1.5) — depthwise convolutions, which XLA maps to
the MXU.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Differentiable -PSNR (dB) surrogate."""
    mse = jnp.maximum(l2_loss(pred, target), 1e-12)
    return 10.0 * jnp.log10(mse)


def _ssim_window(size: int, sigma: float):
    # NumPy on purpose: an lru_cache'd jnp computation would cache a TRACER
    # on the first jit trace and leak it into later traces
    import numpy as np

    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    w = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(w / np.sum(w))


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise gaussian blur of an NHWC image.

    precision=HIGHEST is REQUIRED: TPU lowers default-precision f32 convs
    through the MXU at bf16 operand precision, and SSIM's variances are
    cancellation-prone (sigma = blur(x^2) - mu^2, genuine magnitude
    ~1e-4 on smooth renders vs mu^2 ~1e-1): at bf16 the variances come
    out garbage-negative, SSIM explodes past 1, and the dssim_l1 loss
    goes NEGATIVE and diverges training — the round-2 "DSSIM+densify
    diverges at raised rates" mystery was exactly this, invisible on
    random-image tests (large variance) and on CPU (exact f32 convs)."""
    c = img.shape[-1]
    size = win.shape[0]
    kh = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, c))  # HWIO, I=1
    kw = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(img.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return conv(conv(img, kh), kw)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over an (H, W, 3) pair in [0, 1] (differentiable)."""
    win = _ssim_window(size, sigma)
    x = pred[None].astype(jnp.float32)
    y = target[None].astype(jnp.float32)
    mx, my = _blur(x, win), _blur(y, win)
    mxx, myy, mxy = mx * mx, my * my, mx * my
    sx = _blur(x * x, win) - mxx
    sy = _blur(y * y, win) - myy
    sxy = _blur(x * y, win) - mxy
    c1, c2 = 0.01**2, 0.03**2
    s = ((2.0 * mxy + c1) * (2.0 * sxy + c2)) / (
        (mxx + myy + c1) * (sx + sy + c2)
    )
    return jnp.mean(s)


def dssim_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  lambda_dssim: float = 0.2) -> jnp.ndarray:
    """The 3DGS training objective: (1-λ)·L1 + λ·(1-SSIM)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
