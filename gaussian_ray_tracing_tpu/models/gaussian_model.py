"""Trainable gaussian parameterization (raw, pre-activation).

The reference is inference-only ("training code has not been implemented",
README.md:2); this module adds the differentiable parameterization the
BASELINE requires: raw parameters with the standard 3DGS activations
(exp / normalize / sigmoid, matching the PLY load-time activations in
src/GaussianData.cpp:101-112) applied inside the loss so gradients flow to
the raw space that optimizers expect.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_ray_tracing_tpu.scene.gaussians import GaussianScene


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Raw (pre-activation) gaussian parameters; a differentiable pytree."""

    means: jnp.ndarray  # (N, 3)
    log_scales: jnp.ndarray  # (N, 3)
    raw_quats: jnp.ndarray  # (N, 4) wxyz, unnormalized
    raw_opacities: jnp.ndarray  # (N,) logits
    sh: jnp.ndarray  # (N, K, 3)
    num_active: int = dataclasses.field(default=0, metadata=dict(static=True))

    def activate(self) -> GaussianScene:
        """Raw -> activated scene (differentiable)."""
        norm = jnp.linalg.norm(self.raw_quats, axis=-1, keepdims=True)
        return GaussianScene(
            means=self.means,
            scales=jnp.exp(self.log_scales),
            quats=self.raw_quats / jnp.maximum(norm, 1e-12),
            opacities=jax.nn.sigmoid(self.raw_opacities),
            sh=self.sh,
            num_active=self.num_active,
        )

    @staticmethod
    def from_scene(scene: GaussianScene) -> "GaussianModel":
        """Invert the activations of an activated scene."""
        op = jnp.clip(scene.opacities, 1e-6, 1.0 - 1e-6)
        return GaussianModel(
            means=scene.means,
            log_scales=jnp.log(jnp.maximum(scene.scales, 1e-12)),
            raw_quats=scene.quats,
            raw_opacities=jnp.log(op) - jnp.log1p(-op),
            sh=scene.sh,
            num_active=scene.num_active,
        )

    def to_ply(self, path: str) -> None:
        """Checkpoint raw params back to a standard 3DGS PLY.

        Densification (train/density.py) scatters clones/splits into dead
        slots ANYWHERE in the static-capacity arrays, so the saved set is
        the first num_active slots UNION every slot alive beyond them —
        truncating at num_active silently dropped most of a densified
        scene (round-4 bug: a 24.5k-alive fit saved 2k gaussians and
        evaluated at 8.9 dB)."""
        from gaussian_ray_tracing_tpu.scene.ply import save_ply

        n = self.num_active or self.means.shape[0]
        raw_op = np.asarray(self.raw_opacities)
        keep = np.zeros(raw_op.shape[0], bool)
        keep[:n] = True
        # DEAD_LOGIT + 1 threshold, as train/density._alive_mask
        keep |= raw_op > -11.0
        save_ply(
            path,
            np.asarray(self.means)[keep],
            np.asarray(self.log_scales)[keep],
            np.asarray(self.raw_quats)[keep],
            np.asarray(self.raw_opacities)[keep],
            np.asarray(self.sh)[keep],
        )

    @staticmethod
    def from_ply(path: str, pad_to: int | None = None) -> "GaussianModel":
        from gaussian_ray_tracing_tpu.scene.ply import load_ply

        return GaussianModel.from_scene(load_ply(path, pad_to=pad_to))
