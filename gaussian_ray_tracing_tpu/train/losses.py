"""Image losses for gaussian fitting."""

from __future__ import annotations

import jax.numpy as jnp


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def psnr_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Differentiable -PSNR (dB) surrogate."""
    mse = jnp.maximum(l2_loss(pred, target), 1e-12)
    return 10.0 * jnp.log10(mse)
