"""Checkpoint/resume: orbax TrainState round trip + PLY scene round trip."""

import tempfile

import numpy as np

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene
from gaussian_ray_tracing_tpu.train.trainer import (
    Trainer,
    TrainState,
    default_optimizer,
    restore_train_state,
)

CFG = RenderConfig(hit_multiplicity=1, order="key")


def test_orbax_train_state_roundtrip():
    model = GaussianModel.from_scene(random_scene(300, seed=1))
    tr = Trainer(model, config=CFG)
    cam = Camera.create(eye=(0, 0, 2.5), lookat=(0, 0, 0), width=32, height=32)
    target = render_tiled(random_scene(300, seed=2), cam, CFG)["rgb"]
    tr.fit([(cam, target)], steps=3)
    d = tempfile.mkdtemp()
    tr.save_checkpoint(d)
    template = TrainState.create(
        GaussianModel.from_scene(random_scene(300, seed=9)), default_optimizer()
    )
    restored = restore_train_state(d, template)
    assert int(restored.step) == 3
    np.testing.assert_allclose(
        np.asarray(restored.params.means), np.asarray(tr.state.params.means)
    )
    # adam moments restored too
    new_mu = jax_tree_first(restored.opt_state)
    old_mu = jax_tree_first(tr.state.opt_state)
    np.testing.assert_allclose(np.asarray(new_mu), np.asarray(old_mu))


def jax_tree_first(tree):
    import jax

    return jax.tree.leaves(tree)[0]


def test_ply_scene_roundtrip(tmp_path):
    from gaussian_ray_tracing_tpu.scene.ply import load_ply

    model = GaussianModel.from_scene(random_scene(200, seed=4))
    path = str(tmp_path / "scene.ply")
    model.to_ply(path)
    scene = load_ply(path)
    np.testing.assert_allclose(
        np.asarray(scene.means)[:200], np.asarray(model.means)[:200], atol=1e-6
    )


def test_fit_is_resume_aware():
    """`steps` is the TOTAL schedule length: a trainer restored at step k
    runs exactly steps - k more (and zero when k == steps) — previously a
    resume retrained the full schedule and re-fired densification on the
    finished scene (round-5 live incident)."""
    model = GaussianModel.from_scene(random_scene(200, seed=4))
    tr = Trainer(model, config=CFG)
    cam = Camera.create(eye=(0, 0, 2.5), lookat=(0, 0, 0), width=32, height=32)
    target = render_tiled(random_scene(200, seed=5), cam, CFG)["rgb"]
    tr.fit([(cam, target)], steps=4)
    d = tempfile.mkdtemp()
    tr.save_checkpoint(d)

    tr2 = Trainer(GaussianModel.from_scene(random_scene(200, seed=4)),
                  config=CFG)
    tr2.restore_checkpoint(d)
    assert int(tr2.state.step) == 4
    # completed schedule: no further steps run
    losses = tr2.fit([(cam, target)], steps=4)
    assert losses == []
    assert int(tr2.state.step) == 4
    # extended schedule: exactly the remainder runs
    losses = tr2.fit([(cam, target)], steps=6)
    assert len(losses) == 2
    assert int(tr2.state.step) == 6
