"""Adaptive density control (densify / split / prune), TPU-native.

The 3DGS training recipe (Kerbl et al.; adopted by 3DGRT for ray-traced
training) periodically clones small high-gradient gaussians, splits large
high-gradient ones, prunes near-transparent ones, and resets opacities.
The reference implements none of this (inference-only, README.md:2); it is
required for production-scale fitting.

TPU-native design: everything runs at a STATIC capacity `N_cap` inside one
jitted update — no host round-trips, no recompiles while the population
changes. Liveness is carried by the raw opacity itself: dead slots hold
`raw_opacity = DEAD_LOGIT`, which activates to ~0 opacity, which the
binning stage culls to a zero-radius footprint (ops/response.adaptive_radius
clamps opacity <= alpha_min to radius 0), so dead slots cost nothing
downstream and contribute exactly nothing to renders or gradients.

Slot allocation without dynamic shapes: `argsort` over liveness gives the
dead slots in front; `cumsum` over the birth mask ranks the candidates;
child k of birth candidate k is scattered into dead slot k. All scatters
use unique indices (no atomics, no collisions).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from gaussian_ray_tracing_tpu.models.gaussian_model import GaussianModel

# sigmoid(-12) ~ 6e-6: far below any alpha_min; binning culls these slots.
DEAD_LOGIT = -12.0


@dataclasses.dataclass(frozen=True)
class DensityConfig:
    """Schedule and thresholds (3DGS defaults, world-space gradient variant).

    grad_threshold applies to the accumulated mean-position gradient norm
    averaged over the steps since the last densify, in approximate NDC
    units (DensityState.accumulate scales world grads by depth/focal), so
    the 3DGS screen-space default 2e-4 transfers.
    """

    densify_from_step: int = 500
    densify_until_step: int = 15_000
    densify_every: int = 100
    opacity_reset_every: int = 3_000
    grad_threshold: float = 2e-4
    # split-vs-clone size boundary: fraction of the scene extent
    percent_dense: float = 0.01
    # prune gaussians with activated opacity below this
    min_opacity: float = 5e-3
    # prune gaussians whose world-space max scale exceeds this fraction of
    # the scene extent (0 disables; 3DGS uses 0.1 on SfM-initialized
    # scenes — leave off unless the scene extent is meaningful)
    max_scale_frac: float = 0.0
    # scale shrink factor for split children (3DGS: 1.6)
    split_shrink: float = 1.6


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DensityState:
    """Per-slot gradient statistics accumulated between densify rounds."""

    grad_accum: jnp.ndarray  # (N,) sum of ||d loss / d mean||
    grad_count: jnp.ndarray  # (N,) steps the slot was observed

    @staticmethod
    def create(n_cap: int) -> "DensityState":
        return DensityState(
            grad_accum=jnp.zeros((n_cap,), jnp.float32),
            grad_count=jnp.zeros((n_cap,), jnp.float32),
        )

    def accumulate(self, mean_grads: jnp.ndarray, camera=None,
                   means: jnp.ndarray | None = None) -> "DensityState":
        """Fold one train step's d(loss)/d(means) (N, 3) into the stats.

        With `camera` and `means` given, the world-space gradient norm is
        scaled by depth/focal — the chain-rule factor between world and NDC
        position — so scores are in (approximate) NDC units and the 3DGS
        screen-space threshold (2e-4) transfers across scenes/resolutions.
        """
        g = jnp.linalg.norm(mean_grads, axis=-1)
        if camera is not None and means is not None:
            _, _, W = camera.uvw_frame()
            wlen = jnp.linalg.norm(W)
            w_hat = W / jnp.maximum(wlen, 1e-12)
            depth = jnp.maximum((means - camera.eye) @ w_hat, 1e-6)
            g = g * depth / jnp.maximum(wlen, 1e-12)
        return DensityState(
            grad_accum=self.grad_accum + g,
            grad_count=self.grad_count + (g > 0.0),
        )

    def reset(self) -> "DensityState":
        return DensityState.create(self.grad_accum.shape[0])


def _alive_mask(model: GaussianModel) -> jnp.ndarray:
    return model.raw_opacities > (DEAD_LOGIT + 1.0)


def _scatter_rows(dst: jnp.ndarray, slots: jnp.ndarray, src: jnp.ndarray,
                  valid: jnp.ndarray) -> jnp.ndarray:
    """dst[slots[k]] = src[k] where valid[k]; invalid writes are dropped
    (routed out of bounds — never self-assigned, which could collide with
    a real write to the same slot and resolve nondeterministically)."""
    n = dst.shape[0]
    safe = jnp.where(valid, slots, n)
    return dst.at[safe].set(src, mode="drop")


@functools.partial(jax.jit, static_argnames=("cfg",))
def densify_and_prune(
    model: GaussianModel,
    dstate: DensityState,
    key: jnp.ndarray,
    cfg: DensityConfig,
    scene_extent: jnp.ndarray,
):
    """One densify/prune round at fixed capacity.

    Returns (model, touched (N,) bool) — `touched` marks slots whose
    parameters were created or re-initialized this round; the trainer
    zeroes the optimizer moments there (3DGS resets adam state for new
    gaussians).

    Order of operations (one fused pass):
      1. prune: alpha < min_opacity or max scale > max_scale_frac*extent
      2. score = grad_accum / max(grad_count, 1) on surviving slots
      3. split (score > tau, large): parent slot is re-sampled in place
         with shrunk scales; the sibling goes to a dead slot
      4. clone (score > tau, small): a copy goes to a dead slot
      Births stop silently when dead slots run out (capacity pressure is
      reported by the caller via `alive_count`).
    """
    n = model.means.shape[0]
    alive = _alive_mask(model)

    scales = jnp.exp(model.log_scales)
    max_scale = jnp.max(scales, axis=-1)
    opacity = jax.nn.sigmoid(model.raw_opacities)
    prune = opacity < cfg.min_opacity
    if cfg.max_scale_frac > 0:
        prune = prune | (max_scale > cfg.max_scale_frac * scene_extent)
    # prune only LIVE slots: dead slots trivially fail the opacity floor,
    # and marking them "pruned" would re-kill the births written into them
    # by the final where(prune, DEAD_LOGIT, ...) below
    prune = prune & alive
    alive = alive & ~prune

    score = dstate.grad_accum / jnp.maximum(dstate.grad_count, 1.0)
    hot = alive & (score > cfg.grad_threshold)
    big = max_scale > cfg.percent_dense * scene_extent
    split = hot & big
    clone = hot & ~big

    # --- allocate dead slots to births (splits first, then clones) -------
    dead_order = jnp.argsort(alive.astype(jnp.int32))  # dead slots first
    n_dead = jnp.sum(~alive)
    birth = split | clone
    birth_rank = jnp.cumsum(birth.astype(jnp.int32)) - 1  # rank among births
    has_slot = birth & (birth_rank < n_dead)
    slot_of_birth = dead_order[jnp.clip(birth_rank, 0, n - 1)]

    # order births by slot index of the PARENT for determinism; scatter by
    # parent row k into dead slot slot_of_birth[k]
    parent_idx = jnp.arange(n)

    # split children: sample from the parent gaussian, shrink scales
    from gaussian_ray_tracing_tpu.ops.quaternion import quat_to_rotmat

    norm = jnp.linalg.norm(model.raw_quats, axis=-1, keepdims=True)
    R = quat_to_rotmat(model.raw_quats / jnp.maximum(norm, 1e-12))
    eps = jax.random.normal(key, (n, 3), jnp.float32)
    offset = jnp.einsum("nij,nj->ni", R, scales * eps)
    child_means = model.means + offset
    child_log_scales = model.log_scales - jnp.log(cfg.split_shrink)

    # the birth row written to the dead slot: a split's sibling sample, or
    # a clone's verbatim copy
    b_means = jnp.where(split[:, None], child_means, model.means)
    b_log_scales = jnp.where(split[:, None], child_log_scales, model.log_scales)
    b_quats = model.raw_quats
    b_op = model.raw_opacities
    b_sh = model.sh

    means = _scatter_rows(model.means, slot_of_birth, b_means, has_slot)
    log_scales = _scatter_rows(
        model.log_scales, slot_of_birth, b_log_scales, has_slot
    )
    quats = _scatter_rows(model.raw_quats, slot_of_birth, b_quats, has_slot)
    ops = _scatter_rows(model.raw_opacities, slot_of_birth, b_op, has_slot)
    sh = _scatter_rows(model.sh, slot_of_birth, b_sh, has_slot)

    # split parents are re-sampled in place with shrunk scales (3DGS
    # replaces the parent by two fresh samples; the second sample is the
    # sibling written above)
    key2 = jax.random.fold_in(key, 1)
    eps2 = jax.random.normal(key2, (n, 3), jnp.float32)
    offset2 = jnp.einsum("nij,nj->ni", R, scales * eps2)
    parent_split = split & has_slot
    means = jnp.where(parent_split[:, None], model.means + offset2, means)
    log_scales = jnp.where(
        parent_split[:, None], child_log_scales, log_scales
    )

    # kill pruned slots (originally-dead slots already hold DEAD_LOGIT;
    # the pre-birth `alive` mask must NOT be applied here or it would kill
    # the births just written into dead slots)
    ops = jnp.where(prune, DEAD_LOGIT, ops)

    touched_slot = jnp.zeros((n,), bool)
    touched_slot = _scatter_rows(
        touched_slot.astype(jnp.float32),
        slot_of_birth,
        jnp.ones((n,), jnp.float32),
        has_slot,
    ) > 0.5
    touched = touched_slot | parent_split | prune

    new_model = GaussianModel(
        means=means,
        log_scales=log_scales,
        raw_quats=quats,
        raw_opacities=ops,
        sh=sh,
        num_active=model.num_active,
    )
    return new_model, touched


@functools.partial(jax.jit, static_argnames=("ceiling",))
def reset_opacities(model: GaussianModel, ceiling: float = 0.01) -> GaussianModel:
    """3DGS opacity reset: clamp every live opacity to at most `ceiling`
    (forces the optimizer to re-justify density; prunes follow naturally)."""
    alive = _alive_mask(model)
    logit = jnp.log(ceiling) - jnp.log1p(-ceiling)
    new_op = jnp.minimum(model.raw_opacities, logit)
    return dataclasses.replace(
        model, raw_opacities=jnp.where(alive, new_op, model.raw_opacities)
    )


def alive_count(model: GaussianModel) -> jnp.ndarray:
    return jnp.sum(_alive_mask(model))
