"""Adaptive density control (train/density.py) and the 3DGS training
recipe additions (SSIM loss, per-group optimizer)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.train.density import (
    DEAD_LOGIT,
    DensityConfig,
    DensityState,
    alive_count,
    densify_and_prune,
    reset_opacities,
)


def _padded_model(n_live=64, pad=64, seed=0):
    # pad_to pins the array size exactly (random_scene otherwise buckets up)
    model = GaussianModel.from_scene(
        random_scene(n_live, seed=seed, pad_to=n_live)
    )
    return GaussianModel(
        means=jnp.pad(model.means, ((0, pad), (0, 0))),
        log_scales=jnp.pad(model.log_scales, ((0, pad), (0, 0))),
        raw_quats=jnp.pad(model.raw_quats, ((0, pad), (0, 0)), constant_values=1.0),
        raw_opacities=jnp.concatenate(
            [model.raw_opacities, jnp.full((pad,), DEAD_LOGIT)]
        ),
        sh=jnp.pad(model.sh, ((0, pad), (0, 0), (0, 0))),
        num_active=0,
    )


class TestDensify:
    def test_clone_fills_dead_slots(self):
        model = _padded_model()
        n = model.means.shape[0]
        ds = DensityState.create(n)
        g = jnp.zeros((n, 3)).at[:10, 0].set(1.0)
        ds = ds.accumulate(g)
        cfg = DensityConfig(grad_threshold=0.5, percent_dense=10.0,  # all small
                            min_opacity=0.0)
        m2, touched = densify_and_prune(
            model, ds, jax.random.PRNGKey(0), cfg, jnp.float32(1.0)
        )
        assert int(alive_count(m2)) == 64 + 10
        # clones are verbatim copies of their parents
        new = np.asarray(touched) & (np.asarray(m2.raw_opacities) > DEAD_LOGIT + 1)
        new_means = np.asarray(m2.means)[new]
        parents = np.asarray(model.means)[:10]
        for row in new_means:
            assert np.any(np.all(np.isclose(parents, row), axis=1))

    def test_split_shrinks_and_perturbs(self):
        model = _padded_model()
        n = model.means.shape[0]
        ds = DensityState.create(n)
        g = jnp.zeros((n, 3)).at[:5, 0].set(1.0)
        ds = ds.accumulate(g)
        cfg = DensityConfig(grad_threshold=0.5, percent_dense=0.0,  # all big
                            min_opacity=0.0)
        m2, touched = densify_and_prune(
            model, ds, jax.random.PRNGKey(0), cfg, jnp.float32(1.0)
        )
        assert int(alive_count(m2)) == 64 + 5
        # split parents were re-seeded: scales shrunk by 1.6, means moved
        ls_old = np.asarray(model.log_scales[:5])
        ls_new = np.asarray(m2.log_scales[:5])
        np.testing.assert_allclose(ls_new, ls_old - np.log(1.6), rtol=1e-6)
        assert np.all(np.any(np.asarray(m2.means[:5]) != np.asarray(model.means[:5]), axis=1))
        assert int(touched.sum()) == 10  # 5 parents + 5 siblings

    def test_prune_and_capacity_exhaustion(self):
        model = _padded_model(n_live=64, pad=4)  # only 4 free slots
        n = model.means.shape[0]
        ds = DensityState.create(n)
        ds = ds.accumulate(jnp.ones((n, 3)))
        cfg = DensityConfig(grad_threshold=0.5, percent_dense=10.0, min_opacity=0.0)
        m2, _ = densify_and_prune(
            model, ds, jax.random.PRNGKey(0), cfg, jnp.float32(1.0)
        )
        # births capped at the 4 dead slots; nothing lost or corrupted
        assert int(alive_count(m2)) == 64 + 4
        assert bool(jnp.isfinite(m2.means).all())

        # prune everything via an impossible opacity floor
        cfg2 = DensityConfig(grad_threshold=1e9, min_opacity=1.1)
        m3, _ = densify_and_prune(
            m2, DensityState.create(n), jax.random.PRNGKey(1), cfg2, jnp.float32(1.0)
        )
        assert int(alive_count(m3)) == 0

    def test_births_survive_opacity_floor(self):
        """Regression: with a nonzero min_opacity, births written into dead
        slots must not be re-killed by the prune mask (dead slots trivially
        fail the opacity floor)."""
        model = _padded_model()
        n = model.means.shape[0]
        ds = DensityState.create(n)
        ds = ds.accumulate(jnp.zeros((n, 3)).at[:10, 0].set(1.0))
        cfg = DensityConfig(grad_threshold=0.5, percent_dense=10.0,
                            min_opacity=5e-3)  # the 3DGS default
        m2, _ = densify_and_prune(
            model, ds, jax.random.PRNGKey(0), cfg, jnp.float32(1.0)
        )
        assert int(alive_count(m2)) == int(alive_count(model)) + 10

    def test_dead_slots_render_invisible(self):
        from gaussian_ray_tracing_tpu.cameras import Camera
        from gaussian_ray_tracing_tpu.config import RenderConfig
        from gaussian_ray_tracing_tpu.models.renderer import render

        model = _padded_model()
        cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=64, height=48)
        cfg = RenderConfig(hit_multiplicity=1)
        base = render(model.activate(), cam, cfg, method="tiled")["rgb"]
        # kill half the live slots -> image must change; re-killing dead
        # slots -> no change
        killed = dataclasses.replace(
            model,
            raw_opacities=model.raw_opacities.at[:32].set(DEAD_LOGIT),
        )
        out = render(killed.activate(), cam, cfg, method="tiled")["rgb"]
        assert not np.allclose(np.asarray(base), np.asarray(out))
        rekill = reset_opacities(killed)  # acts only on live slots
        out2 = render(rekill.activate(), cam, cfg, method="tiled")["rgb"]
        assert bool(jnp.isfinite(out2).all())

    def test_opacity_reset_ceiling(self):
        model = _padded_model()
        m2 = reset_opacities(model, ceiling=0.01)
        op = np.asarray(jax.nn.sigmoid(m2.raw_opacities[:64]))
        assert np.all(op <= 0.0101)
        # dead slots untouched
        np.testing.assert_array_equal(
            np.asarray(m2.raw_opacities[64:]), np.asarray(model.raw_opacities[64:])
        )


class TestSSIM:
    def test_identity_and_range(self):
        from gaussian_ray_tracing_tpu.train.losses import dssim_l1_loss, ssim

        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 48, 3))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
        s = float(ssim(img, noisy))
        assert 0.0 < s < 0.95
        assert float(dssim_l1_loss(img, img)) == pytest.approx(0.0, abs=1e-5)
        # differentiable
        g = jax.grad(lambda a: dssim_l1_loss(a, noisy))(img)
        assert bool(jnp.isfinite(g).all())


class TestSSIMRetrace:
    def test_ssim_across_jit_traces(self):
        """Regression: the SSIM window must not be lru_cache'd as a traced
        value — a second jit trace (e.g. the trainer recompiling at a new
        pair-capacity bucket) would see the first trace's leaked tracer."""
        import jax

        from gaussian_ray_tracing_tpu.train.losses import ssim

        a = jax.random.uniform(jax.random.PRNGKey(0), (16, 24, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (20, 16, 3))
        assert float(jax.jit(ssim)(a, a)) == pytest.approx(1.0, abs=1e-5)
        assert float(jax.jit(ssim)(b, b)) == pytest.approx(1.0, abs=1e-5)


class TestGaussianOptimizer:
    def test_per_group_rates_and_moment_reset(self):
        from gaussian_ray_tracing_tpu.train.trainer import (
            gaussian_optimizer,
            reset_opt_moments,
        )

        model = _padded_model()
        tx = gaussian_optimizer(scene_extent=2.0, total_steps=100)
        state = tx.init(model)
        grads = jax.tree_util.tree_map(jnp.ones_like, model)
        updates, state = tx.update(grads, state, model)
        # means step ~ 1.6e-4 * extent; opacity step ~ 5e-2 (adam: |u| ~ lr)
        assert abs(float(jnp.abs(updates.means).max())) < 1e-2
        assert abs(float(jnp.abs(updates.raw_opacities).max())) > 1e-3
        # sh higher bands at 1/20 of DC
        if updates.sh.shape[1] > 1:
            ratio = float(jnp.abs(updates.sh[:, 1:]).max() / jnp.abs(updates.sh[:, :1]).max())
            assert ratio < 0.1

        touched = jnp.zeros((model.means.shape[0],), bool).at[3].set(True)
        state2 = reset_opt_moments(state, touched)
        leaves = [x for x in jax.tree_util.tree_leaves(state2)
                  if isinstance(x, jnp.ndarray) and x.ndim >= 1
                  and x.shape[0] == model.means.shape[0]
                  and jnp.issubdtype(x.dtype, jnp.floating)]
        assert leaves, "no slot-shaped moment arrays found"
        for x in leaves:
            assert float(jnp.abs(x[3]).max()) == 0.0


class TestTrainerDensity:
    def test_fit_with_density_control(self):
        from gaussian_ray_tracing_tpu.cameras import Camera
        from gaussian_ray_tracing_tpu.config import RenderConfig
        from gaussian_ray_tracing_tpu.models.tiled import render_tiled
        from gaussian_ray_tracing_tpu.train.trainer import Trainer

        cfg = RenderConfig(hit_multiplicity=1, order="key")
        target_scene = random_scene(300, seed=0)
        cam = Camera.create(eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
                            width=48, height=32)
        target = render_tiled(target_scene, cam, cfg)["rgb"]
        init = random_scene(100, seed=1, pad_to=256)
        density = DensityConfig(densify_from_step=2, densify_until_step=100,
                                densify_every=4, opacity_reset_every=0,
                                grad_threshold=0.0, min_opacity=0.0)
        tr = Trainer(GaussianModel.from_scene(init), config=cfg, lr=5e-3,
                     density=density)
        before = tr.alive()
        losses = tr.fit([(cam, target)], steps=10)
        assert tr.alive() > before  # threshold 0 -> everything densifies
        assert np.isfinite(losses).all()


def test_to_ply_keeps_densified_slots_beyond_num_active(tmp_path):
    """Densification scatters births into dead slots anywhere in the
    static-capacity arrays; to_ply must save them (round-4 bug: a
    24.5k-alive fit saved its first 2k slots and evaluated at 8.9 dB)."""
    import numpy as np

    from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
    from gaussian_ray_tracing_tpu.scene.ply import load_ply
    from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

    model = GaussianModel.from_scene(random_scene(64, seed=1, pad_to=256))
    # births beyond num_active (as train/density._scatter_rows would make)
    raw_op = np.array(model.raw_opacities)
    raw_op[200:210] = 0.5
    model = dataclasses.replace(
        model, raw_opacities=jnp.asarray(raw_op)
    )
    path = str(tmp_path / "densified.ply")
    model.to_ply(path)
    reloaded = load_ply(path)
    assert reloaded.num_active == model.num_active + 10
