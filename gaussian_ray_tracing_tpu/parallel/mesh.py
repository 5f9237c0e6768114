"""Device-mesh construction and common shardings."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"
GAUSS_AXIS = "gauss"


def make_mesh(n_devices: int | None = None, axis: str = RAY_AXIS) -> Mesh:
    """1D mesh over the first n devices (rays-sharded by default)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return Mesh(np.asarray(devs[:n_devices]), (axis,))


def make_mesh_2d(n_ray: int, n_gauss: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_ray * n_gauss]).reshape(n_ray, n_gauss)
    return Mesh(devs, (RAY_AXIS, GAUSS_AXIS))


def ray_axis_sharding(mesh: Mesh, ndim: int, axis: str = RAY_AXIS) -> NamedSharding:
    """Shard the leading dim over the ray axis, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
