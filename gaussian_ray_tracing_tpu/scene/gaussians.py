"""Gaussian particle scene as a structure-of-arrays pytree.

The reference stores an array-of-structs GaussianParticle {position, scale,
rotation, opacity, sh[16]} (src/GaussianData.h:12-20), parsed from a trained
3DGS PLY with activations applied at load time (src/GaussianData.cpp:97-131):
scale = exp(raw), quaternion = normalize(raw) in wxyz order, opacity =
sigmoid(raw).  On TPU we keep SoA jnp arrays, padded to a multiple of the
lane width so kernels see aligned shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

PAD_MULTIPLE = 256


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    """Activated gaussian parameters (SoA).

    Attributes:
      means:     (N, 3) world-space centers
      scales:    (N, 3) ellipsoid axis lengths (post exp activation)
      quats:     (N, 4) unit quaternions, wxyz (post normalization)
      opacities: (N,)   in (0, 1) (post sigmoid)
      sh:        (N, K, 3) SH coefficients, K = (max_degree+1)^2, DC first
                 (interleaved RGB layout per src/GaussianData.cpp:113-128)

    Padding entries (index >= num_active) carry opacity 0 so every renderer
    culls them for free (alpha = resp*0 <= alpha_min).
    """

    means: jnp.ndarray
    scales: jnp.ndarray
    quats: jnp.ndarray
    opacities: jnp.ndarray
    sh: jnp.ndarray
    num_active: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def sh_coeffs(self) -> int:
        return self.sh.shape[1]

    def center(self) -> jnp.ndarray:
        """Mean of active positions (camera init; src/GaussianData.cpp:140-152)."""
        n = max(self.num_active, 1)
        return jnp.sum(self.means[: self.num_active], axis=0) / n

    @staticmethod
    def from_activated(means, scales, quats, opacities, sh, pad_to: int | None = None):
        """Build a scene from already-activated arrays, padding to lane width."""
        n = int(np.shape(means)[0])
        if pad_to is None:
            pad_to = -(-n // PAD_MULTIPLE) * PAD_MULTIPLE
        if pad_to < n:
            raise ValueError(f"pad_to={pad_to} < num gaussians {n}")
        pad = pad_to - n

        def _pad(x, fill=0.0):
            x = jnp.asarray(x, jnp.float32)
            if pad == 0:
                return x
            widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        quats_p = _pad(quats)
        if pad:  # keep padding quaternions unit-norm
            quats_p = quats_p.at[n:, 0].set(1.0)
        scales_p = _pad(scales)
        if pad:  # avoid 1/0 in canonical frames of padding entries
            scales_p = scales_p.at[n:].set(1.0)
        return GaussianScene(
            means=_pad(means),
            scales=scales_p,
            quats=quats_p,
            opacities=_pad(opacities),
            sh=_pad(sh),
            num_active=n,
        )

    @staticmethod
    def from_raw(means, raw_scales, raw_quats, raw_opacities, sh, pad_to=None):
        """Apply the load-time activations (src/GaussianData.cpp:101-112)."""
        raw_quats = jnp.asarray(raw_quats, jnp.float32)
        norm = jnp.linalg.norm(raw_quats, axis=-1, keepdims=True)
        return GaussianScene.from_activated(
            means=means,
            scales=jnp.exp(jnp.asarray(raw_scales, jnp.float32)),
            quats=raw_quats / jnp.maximum(norm, 1e-12),
            opacities=jax.nn.sigmoid(jnp.asarray(raw_opacities, jnp.float32)),
            sh=sh,
            pad_to=pad_to,
        )

    def replace(self, **kw) -> "GaussianScene":
        return dataclasses.replace(self, **kw)
