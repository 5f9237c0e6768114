"""Train step + loop for fitting gaussian scenes to target images.

A new capability over the reference (inference-only, README.md:2). The
sharded step shards image tiles over the mesh 'rays' axis via the
differentiable shard_map renderer; parameter gradients come back replicated
(shard_map's transpose inserts the psum over ICI, overlapped by XLA with
the backward sweep).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel
from gaussian_ray_tracing_tpu.models.tiled import render_tiled
from gaussian_ray_tracing_tpu.train.losses import l2_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TrainState:
    params: GaussianModel
    opt_state: object
    step: jnp.ndarray

    @staticmethod
    def create(params: GaussianModel, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def default_optimizer(lr: float = 2e-3) -> optax.GradientTransformation:
    return optax.adam(lr)


def make_train_step(
    config: RenderConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = l2_loss,
    use_pallas: Optional[bool] = None,
):
    """Build a jitted train step: (state, camera, target(H,W,3)) -> (state, metrics).

    use_pallas (default: on TPU, single device): render through the fused
    Pallas march with the HAND-WRITTEN backward kernel
    (ops/pallas_march.march_stream_diff); otherwise the XLA tiled path
    (autodiff + remat). With a mesh, rendering is tile-sharded over the
    'rays' axis (the grad psum across shards is inserted by shard_map's
    transpose).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def compute_loss(params: GaussianModel, camera: Camera, target: jnp.ndarray):
        scene = params.activate()
        if mesh is None:
            if use_pallas:
                from gaussian_ray_tracing_tpu.models.pallas_renderer import (
                    render_pallas_diff,
                )

                out = render_pallas_diff(scene, camera, config)
            else:
                out = render_tiled(scene, camera, config)
        elif use_pallas:
            from gaussian_ray_tracing_tpu.parallel.sharded import (
                render_pallas_sharded_diff,
            )

            out = render_pallas_sharded_diff(scene, camera, config, mesh)
        else:
            from gaussian_ray_tracing_tpu.parallel.sharded import render_tiled_sharded

            out = render_tiled_sharded(scene, camera, config, mesh)
        return loss_fn(out["rgb"], target)

    @jax.jit
    def train_step(state: TrainState, camera: Camera, target: jnp.ndarray):
        loss, grads = jax.value_and_grad(compute_loss)(state.params, camera, target)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        return new_state, {"loss": loss}

    return train_step


class Trainer:
    """Minimal fitting loop over (camera, target) pairs with PLY checkpointing."""

    def __init__(
        self,
        params: GaussianModel,
        config: RenderConfig = RenderConfig(),
        lr: float = 2e-3,
        mesh: Optional[Mesh] = None,
    ):
        self.tx = default_optimizer(lr)
        self.state = TrainState.create(params, self.tx)
        self.step_fn = make_train_step(config, self.tx, mesh=mesh)
        self.config = config

    def fit(self, views: list[tuple[Camera, jnp.ndarray]], steps: int, log_every: int = 50):
        losses = []
        for i in range(steps):
            cam, target = views[i % len(views)]
            self.state, metrics = self.step_fn(self.state, cam, target)
            losses.append(float(metrics["loss"]))
        return losses

    def save(self, path: str):
        """Checkpoint the scene as a standard 3DGS PLY (interoperable with
        the reference and the wider 3DGS ecosystem)."""
        self.state.params.to_ply(path)

    def save_checkpoint(self, directory: str, step: int | None = None):
        """Full training checkpoint (params + optimizer state) via orbax."""
        save_train_state(directory, self.state, step=step)

    def restore_checkpoint(self, directory: str, step: int | None = None):
        self.state = restore_train_state(directory, self.state, step=step)


def save_train_state(directory: str, state: TrainState, step: int | None = None):
    """Orbax checkpoint of the full TrainState (params + adam moments +
    step counter) — resumable training, a capability the inference-only
    reference has no analog for (SURVEY.md section 5, checkpoint/resume)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(
            int(state.step) if step is None else step,
            args=ocp.args.StandardSave(state),
        )


def restore_train_state(
    directory: str, template: TrainState, step: int | None = None
) -> TrainState:
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(directory)
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step() if step is None else step
        return mgr.restore(step, args=ocp.args.StandardRestore(template))
