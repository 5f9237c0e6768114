"""Differentiable-pass tests (BASELINE.json config 4): pixel-loss gradients
w.r.t. means/scales/quats/opacity/SH, checked against finite differences."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.models.oracle import render_rays_oracle
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

CFG = RenderConfig(hit_multiplicity=1)


def small_model(n=24, seed=11):
    scene = random_scene(
        n, seed=seed, extent=0.8, mean_scale=0.15, pad_to=n, density_scaling=False
    )
    return GaussianModel.from_scene(scene)


@partial(jax.jit, static_argnames=("cfg",))
def ray_loss(model: GaussianModel, cfg=CFG):
    origins = jnp.array([[0.0, 0.0, 3.0], [0.3, 0.1, 3.0], [-0.2, 0.2, 3.0]])
    dirs = jnp.array([[0.0, 0.0, -1.0], [-0.05, 0.0, -1.0], [0.05, -0.05, -1.0]])
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    rgb, density, _ = render_rays_oracle(model.activate(), origins, dirs, cfg, ray_chunk=4)
    # weighted pixel loss exercising both color and alpha paths
    return jnp.sum(rgb * jnp.array([[0.3, 0.5, 0.2]])) + 0.25 * jnp.sum(density)


ray_loss_grad = jax.jit(jax.grad(ray_loss), static_argnames=("cfg",))


@pytest.mark.parametrize(
    "field", ["means", "log_scales", "raw_quats", "raw_opacities", "sh"]
)
def test_grad_vs_finite_difference(field):
    model = small_model()
    grads = ray_loss_grad(model)
    g = np.asarray(getattr(grads, field), np.float64)

    # probe the few largest-gradient coordinates with central differences
    flat = np.abs(g).ravel()
    idxs = np.argsort(flat)[-4:]
    base = np.asarray(getattr(model, field), np.float64)
    eps = 3e-4
    for idx in idxs:
        if flat[idx] < 1e-8:
            continue
        coord = np.unravel_index(idx, base.shape)
        delta = np.zeros_like(base)
        delta[coord] = eps
        up = dataclass_replace(model, field, base + delta)
        dn = dataclass_replace(model, field, base - delta)
        fd = (float(ray_loss(up)) - float(ray_loss(dn))) / (2 * eps)
        ref = g[coord]
        assert np.isclose(fd, ref, rtol=0.05, atol=1e-4), (
            f"{field}{coord}: fd={fd:.6g} grad={ref:.6g}"
        )


def dataclass_replace(model, field, value):
    import dataclasses

    return dataclasses.replace(model, **{field: jnp.asarray(value, jnp.float32)})


def test_grad_multiplicity2():
    model = small_model()
    cfg = RenderConfig(hit_multiplicity=2)
    grads = ray_loss_grad(model, cfg)
    g = np.asarray(grads.raw_opacities, np.float64)
    idx = int(np.argmax(np.abs(g)))
    eps = 3e-4
    base = np.asarray(model.raw_opacities, np.float64)
    delta = np.zeros_like(base)
    delta[idx] = eps
    up = dataclass_replace(model, "raw_opacities", base + delta)
    dn = dataclass_replace(model, "raw_opacities", base - delta)
    fd = (float(ray_loss(up, cfg)) - float(ray_loss(dn, cfg))) / (2 * eps)
    assert np.isclose(fd, g[idx], rtol=0.05, atol=1e-4)


def test_tiled_grads_match_oracle_grads():
    """Gradients through the tiled fast path agree with oracle gradients."""
    model = small_model(n=64, seed=13)
    cam = Camera.create(eye=(0, 0, 3), lookat=(0, 0, 0), width=32, height=32)
    target = jnp.zeros((32, 32, 3))

    def loss_tiled(m):
        out = render_tiled(m.activate(), cam, CFG)
        return jnp.mean((out["rgb"] - target) ** 2)

    from gaussian_ray_tracing_tpu.models.oracle import render_oracle

    def loss_oracle(m):
        out = render_oracle(m.activate(), cam, CFG)
        return jnp.mean((out["rgb"] - target) ** 2)

    gt = jax.grad(loss_tiled)(model)
    go = jax.grad(loss_oracle)(model)
    for f in ["means", "log_scales", "raw_quats", "raw_opacities", "sh"]:
        a, b = np.asarray(getattr(gt, f)), np.asarray(getattr(go, f))
        denom = np.maximum(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-2, err_msg=f)


def test_model_roundtrip():
    scene = random_scene(50, seed=1)
    model = GaussianModel.from_scene(scene)
    back = model.activate()
    np.testing.assert_allclose(back.scales, scene.scales, rtol=1e-5)
    np.testing.assert_allclose(back.opacities, scene.opacities, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(back.quats, scene.quats, rtol=1e-5, atol=1e-6)
