"""Train step + loop for fitting gaussian scenes to target images.

A new capability over the reference (inference-only, README.md:2). The
sharded step shards image tiles over the mesh 'rays' axis via the
differentiable shard_map renderer; parameter gradients come back replicated
(shard_map's transpose inserts the psum over ICI, overlapped by XLA with
the backward sweep).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

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


def gaussian_optimizer(
    scene_extent: float = 1.0,
    total_steps: int = 30_000,
    lr_scale: float = 1.0,
) -> optax.GradientTransformation:
    """Per-parameter-group adam with the 3DGS learning-rate recipe:
    means at 1.6e-4 * extent exponentially decayed 100x over the run,
    scales 5e-3, rotations 1e-3, opacities 5e-2, SH 2.5e-3 (higher-order
    coefficients at 1/20 of the DC rate)."""
    means_lr = optax.exponential_decay(
        1.6e-4 * scene_extent * lr_scale,
        transition_steps=max(total_steps, 1),
        decay_rate=0.01,
    )

    def scale_sh_rest() -> optax.GradientTransformation:
        # sh updates: column 0 (DC) full rate, higher bands at 1/20
        def update(updates, state, params=None):
            del params

            def f(u):
                if u.ndim == 3 and u.shape[1] > 1:  # (N, K, 3)
                    return u.at[:, 1:, :].multiply(1.0 / 20.0)
                return u

            return jax.tree_util.tree_map(f, updates), state

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update)

    adam = lambda lr: optax.adam(lr, eps=1e-15)
    return optax.multi_transform(
        {
            "means": adam(means_lr),
            "log_scales": adam(5e-3 * lr_scale),
            "raw_quats": adam(1e-3 * lr_scale),
            "raw_opacities": adam(5e-2 * lr_scale),
            "sh": optax.chain(adam(2.5e-3 * lr_scale), scale_sh_rest()),
        },
        # labels built FROM the params so the static num_active field (part
        # of the treedef) matches whatever model is being optimized
        param_labels=lambda params: dataclasses.replace(
            params,
            means="means",
            log_scales="log_scales",
            raw_quats="raw_quats",
            raw_opacities="raw_opacities",
            sh="sh",
        ),
    )


def reset_opt_moments(opt_state, touched: jnp.ndarray):
    """Zero optimizer moment rows of `touched` slots (3DGS re-initializes
    adam state for gaussians created or re-seeded by densification).
    Applies to every state array whose leading axis is the slot axis."""
    n = touched.shape[0]

    def z(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == n and x.dtype != jnp.int32:
            shape = (-1,) + (1,) * (x.ndim - 1)
            return jnp.where(touched.reshape(shape), jnp.zeros_like(x), x)
        return x

    return jax.tree_util.tree_map(z, opt_state)


def shard_opt_state_constraint(opt_state, params: GaussianModel, mesh: Mesh):
    """ZeRO-1 analog: constrain every optimizer-state array whose leading
    axis is the gaussian slot axis to be sharded over the mesh's data-
    parallel ('rays') axis. Params and grads stay replicated (they are
    needed in full by every shard's render); only the adam moments — 2x
    the parameter memory — shrink to 1/n_dev per device. GSPMD inserts
    the update-time collectives (the moment update runs on each device's
    own shard; optax.apply_updates all-gathers the updates back).
    """
    from gaussian_ray_tracing_tpu.parallel.mesh import RAY_AXIS
    from jax.sharding import NamedSharding

    n = params.means.shape[0]
    n_dev = mesh.shape.get(RAY_AXIS, 1)
    if n % n_dev != 0:
        return opt_state  # non-divisible capacity: keep replicated

    def c(x):
        if isinstance(x, jnp.ndarray) and x.ndim >= 1 and x.shape[0] == n:
            spec = P(RAY_AXIS, *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec)
            )
        return x

    return jax.tree_util.tree_map(c, opt_state)


def make_train_step(
    config: RenderConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    loss_fn: Callable = l2_loss,
    use_pallas: Optional[bool] = None,
    pair_capacity: Optional[int] = None,
    shard_opt_state: bool = True,
):
    """Build a jitted train step: (state, camera, target(H,W,3)) -> (state, metrics).

    use_pallas (default: on TPU, single device): render through the fused
    Pallas march with the HAND-WRITTEN backward kernel
    (ops/pallas_march.march_stream_diff); otherwise the XLA tiled path
    (autodiff + remat). With a mesh, rendering is tile-sharded over the
    'rays' axis (the grad psum across shards is inserted by shard_map's
    transpose) and, with shard_opt_state, the adam moments are sharded
    over the same axis on the gaussian dim (see
    shard_opt_state_constraint) so optimizer memory scales 1/n_dev.
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

                out = render_pallas_diff(scene, camera, config,
                                         pair_capacity=pair_capacity)
            else:
                out = render_tiled(scene, camera, config,
                                   pair_capacity=pair_capacity)
        elif use_pallas:
            from gaussian_ray_tracing_tpu.parallel.sharded import (
                render_pallas_sharded_diff,
            )

            out = render_pallas_sharded_diff(scene, camera, config, mesh,
                                             pair_capacity=pair_capacity)
        else:
            from gaussian_ray_tracing_tpu.parallel.sharded import render_tiled_sharded

            out = render_tiled_sharded(scene, camera, config, mesh,
                                       pair_capacity=pair_capacity)
        return loss_fn(out["rgb"], target)

    @jax.jit
    def train_step(state: TrainState, camera: Camera, target: jnp.ndarray):
        loss, grads = jax.value_and_grad(compute_loss)(state.params, camera, target)
        opt_in = state.opt_state
        if mesh is not None and shard_opt_state:
            opt_in = shard_opt_state_constraint(opt_in, state.params, mesh)
        updates, opt_state = tx.update(grads, opt_in, state.params)
        if mesh is not None and shard_opt_state:
            opt_state = shard_opt_state_constraint(opt_state, state.params, mesh)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1)
        # mean_grads feeds the densification statistics (train/density.py);
        # it stays on device unless fetched
        return new_state, {"loss": loss, "mean_grads": grads.means}

    return train_step


class Trainer:
    """Fitting loop over (camera, target) pairs with PLY checkpointing and
    optional 3DGS adaptive density control (train/density.py).

    Density control runs at a STATIC parameter capacity (the arrays'
    leading dim); clones/splits fill dead slots, prunes free them — no
    recompiles while the population changes. Pass a `GaussianModel` whose
    arrays are padded above the expected final count (e.g. `pad_to=` in the
    loaders) when enabling densification.
    """

    def __init__(
        self,
        params: GaussianModel,
        config: RenderConfig = RenderConfig(),
        lr: float = 2e-3,
        mesh: Optional[Mesh] = None,
        loss_fn: Callable = None,
        optimizer: Optional[optax.GradientTransformation] = None,
        density: "DensityConfig | None" = None,
        seed: int = 0,
    ):
        from gaussian_ray_tracing_tpu.train.density import DensityState

        self.tx = optimizer if optimizer is not None else default_optimizer(lr)
        self.state = TrainState.create(params, self.tx)
        self._step_kw = {} if loss_fn is None else {"loss_fn": loss_fn}
        self._mesh = mesh
        self.config = config
        self._pair_capacity: int | None = None
        self._step_cache: dict = {}
        self._build_step()
        self.density = density
        self.dstate = DensityState.create(params.means.shape[0])
        self.key = jax.random.PRNGKey(seed)
        # robust extent: bounding-sphere radius of the initial means
        center = jnp.mean(params.means, axis=0)
        self.scene_extent = float(
            jnp.max(jnp.linalg.norm(params.means - center, axis=-1))
        )

    def _density_round(self, step: int):
        from gaussian_ray_tracing_tpu.train.density import (
            densify_and_prune,
            reset_opacities,
        )

        cfg = self.density
        changed = False
        in_window = cfg.densify_from_step <= step <= cfg.densify_until_step
        if in_window and step % cfg.densify_every == 0:
            self.key, sub = jax.random.split(self.key)
            params, touched = densify_and_prune(
                self.state.params, self.dstate, sub, cfg,
                jnp.float32(self.scene_extent),
            )
            opt_state = reset_opt_moments(self.state.opt_state, touched)
            self.state = TrainState(params, opt_state, self.state.step)
            self.dstate = self.dstate.reset()
            changed = True
        if in_window and cfg.opacity_reset_every and step % cfg.opacity_reset_every == 0:
            self.state = dataclasses.replace(
                self.state, params=reset_opacities(self.state.params)
            )
        return changed

    def _build_step(self):
        cap = self._pair_capacity
        if cap not in self._step_cache:
            self._step_cache[cap] = make_train_step(
                self.config, self.tx, mesh=self._mesh,
                pair_capacity=cap, **self._step_kw,
            )
        self.step_fn = self._step_cache[cap]

    def _refresh_capacity(self, views):
        """Snug power-of-two pair-capacity bucket from EXACT per-view pair
        counts (ops/tiles.count_pairs — O(N) footprint math, no expansion).
        Sort/gather cost in every step scales with the capacity, so
        training at the default 8N over-provision wastes time; re-probed
        after every densify round because the population grows."""
        from gaussian_ray_tracing_tpu.ops.tiles import count_pairs

        scene = self.state.params.activate()
        worst = max(
            int(count_pairs(scene, cam, self.config)) for cam, _ in views
        )
        # 64k-multiple buckets: snug (a power-of-two bucket wastes up to 2x
        # of sort/gather time) while still amortizing recompiles; only
        # GROW mid-run (shrinking would recompile on noise)
        cap = max(1 << 16, -(-int(worst * 1.3) // 65536) * 65536)
        if self._pair_capacity is None or cap > self._pair_capacity:
            self._pair_capacity = cap
            self._build_step()

    def fit(self, views: list[tuple[Camera, jnp.ndarray]], steps: int, log_every: int = 50,
            checkpoint_dir: str | None = None):
        """Fit over the view set.

        Steps run in jit-compiled SEGMENTS (one lax.fori_loop per span
        between host events — density rounds / the end of training), with
        the view cameras and targets stacked into device arrays and
        indexed per step. The round-2 per-step host loop paid ~30 ms of
        tunnel dispatch per step (plus a loss fetch sync); segments bring
        a 10k-step dataset fit from hours to minutes on the tunneled chip.
        Views with heterogeneous sizes fall back to the per-step loop.
        """
        self._refresh_capacity(views)
        cam0 = views[0][0]
        uniform = all(
            c.width == cam0.width and c.height == cam0.height
            and c.fov_y_deg == cam0.fov_y_deg for c, _ in views
        )
        if not uniform or self._mesh is not None:
            return self._fit_unbatched(views, steps)

        V = len(views)
        eyes = jnp.stack([c.eye for c, _ in views])
        looks = jnp.stack([c.lookat for c, _ in views])
        ups = jnp.stack([c.up for c, _ in views])
        targets = jnp.stack([t for _, t in views])

        def _runner(n: int, cap):
            key = ("seg", n, cap)
            if key not in self._step_cache:
                step_fn = self.step_fn
                with_density = self.density is not None

                @jax.jit
                def run(state, dstate, start, eyes, looks, ups, targets):
                    def body(i, carry):
                        state, dstate, larr = carry
                        v = jnp.mod(start + i, V)
                        cam = Camera(eyes[v], looks[v], ups[v],
                                     cam0.fov_y_deg, cam0.width, cam0.height)
                        state, metrics = step_fn(state, cam, targets[v])
                        if with_density:
                            dstate = dstate.accumulate(
                                metrics["mean_grads"], camera=cam,
                                means=state.params.means,
                            )
                        larr = larr.at[i].set(metrics["loss"])
                        return state, dstate, larr

                    larr0 = jnp.zeros((n,), jnp.float32)
                    return jax.lax.fori_loop(
                        0, n, body, (state, dstate, larr0)
                    )

                self._step_cache[key] = run
            return self._step_cache[key]

        def _next_event(cur: int) -> int:
            """First step index > cur at which a host-side density event
            fires (1-indexed like _density_round), else `steps`."""
            c = self.density
            best = steps
            if c is None:
                return best
            for p in (c.densify_every, c.opacity_reset_every):
                if not p:
                    continue
                k = (cur // p + 1) * p
                if k < c.densify_from_step:
                    k = -(-c.densify_from_step // p) * p
                if k <= c.densify_until_step:
                    best = min(best, k)
            return best

        losses: list[float] = []
        # resume-aware: `steps` is the TOTAL schedule length. A restored
        # checkpoint (cli fit --checkpoint-dir) carries state.step; without
        # this, a resumed run would retrain `steps` ADDITIONAL steps and
        # re-fire the whole density schedule on the already-trained scene
        # (found round 5 when a crash-resume started re-densifying a
        # finished 30k run).
        cur = min(int(self.state.step), steps)
        # segment-length cap: one jitted fori_loop per span, but never so
        # long that a single device program runs for minutes — the
        # tunneled TPU worker drops multi-minute programs (both round-4
        # 10k-step runs died exactly at the 5k-step post-densify span),
        # and shorter segments also bound checkpoint/loss-fetch latency
        max_seg = 512
        while cur < steps:
            n = min(_next_event(cur), steps, cur + max_seg) - cur
            run = _runner(n, self._pair_capacity)
            self.state, self.dstate, larr = run(
                self.state, self.dstate, jnp.int32(cur),
                eyes, looks, ups, targets,
            )
            losses.extend(float(x) for x in larr)
            cur += n
            if self.density is not None and cur < steps:
                changed = self._density_round(cur)
                if changed:
                    self._refresh_capacity(views)
            if checkpoint_dir is not None and cur < steps:
                # crash insurance on long tunneled-TPU runs: the segment's
                # loss fetch above already synced, so this costs one host
                # round-trip per segment (~minutes apart)
                self.save_checkpoint(checkpoint_dir)
        return losses

    def _fit_unbatched(self, views, steps):
        losses = []
        # resume-aware, like the batched path: `steps` is the total
        for i in range(min(int(self.state.step), steps), steps):
            cam, target = views[i % len(views)]
            self.state, metrics = self.step_fn(self.state, cam, target)
            if self.density is not None:
                self.dstate = self.dstate.accumulate(
                    metrics["mean_grads"], camera=cam,
                    means=self.state.params.means,
                )
                changed = self._density_round(i + 1)
                if changed:
                    self._refresh_capacity(views)
            losses.append(float(metrics["loss"]))
        return losses

    def alive(self) -> int:
        from gaussian_ray_tracing_tpu.train.density import alive_count

        return int(alive_count(self.state.params))

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
