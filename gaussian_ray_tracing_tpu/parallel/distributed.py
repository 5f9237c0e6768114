"""Multi-host (multi-process) entry point.

The reference is strictly single-process / single-GPU (one ``optixLaunch``
on one stream, /root/reference/src/GaussianTracer.cpp:504,525); BASELINE
config 5 mandates scaling from 1 chip to >= 2 hosts. The TPU-native design:
``jax.distributed.initialize()`` connects the processes, every process
builds the SAME global mesh over all devices (ICI within a slice, DCN
across slices), and the existing sharded renderers / train steps
(parallel/sharded.py) run unchanged — shard_map collectives (psum /
all_gather / ppermute) are already expressed against mesh axis names, so
the same code drives 8 virtual CPU devices in one process, 8 real chips in
one process, or 4+4 chips across two hosts.

Host-local data movement is the only multi-process-specific concern:
process-local numpy arrays must become global jax.Arrays before entering a
jitted sharded computation (``global_scene`` / ``global_array`` below).

Demonstrated without a pod by tests/test_distributed.py: two local
processes x 4 virtual CPU devices each form one 8-device mesh (gloo
collectives), and the sharded render matches the single-process result
bit-for-bit.

Real 2-host TPU launch (same code path)::

    # host 0                                  # host 1
    grt render --distributed \\
      --coordinator host0:8476 --num-processes 2 --process-id 0   # (id 1)

    On Cloud TPU pods, plain ``--distributed`` with no addresses uses JAX's
    automatic cluster detection (TPU metadata) instead.
"""

from __future__ import annotations

import jax
import numpy as np

_initialized = False


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    With no arguments, relies on JAX's automatic environment detection
    (Cloud TPU metadata / SLURM / Open MPI); with explicit arguments, wires
    an arbitrary process set (used by the local 2-process CPU test).
    """
    global _initialized
    # NB: must not touch jax.devices()/process_count() before initialize —
    # any backend query locks in the single-process backend. The service
    # handle is the ground truth for "already initialized".
    from jax._src import distributed as _dist

    if _initialized or _dist.global_state.client is not None:
        _initialized = True
        return
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    if local_device_ids is not None:
        kw["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kw)
    _initialized = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_array(x, mesh, spec=None):
    """Lift a host-local (numpy/jax) array to a global jax.Array on `mesh`.

    spec=None (default) means fully replicated: every process must pass the
    SAME values (the scene, the camera, small metadata). A sharded spec
    means each process passes ITS OWN shard(s) of the global array.
    Single-process: device_put with the equivalent NamedSharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P() if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    x = np.asarray(x)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if spec == P():
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)
    return jax.make_array_from_process_local_data(sharding, x)


def global_scene(scene, mesh):
    """Replicate a GaussianScene onto every device of a (multi-host) mesh."""
    return jax.tree.map(lambda x: global_array(x, mesh), scene)


def fetch(x):
    """Device->host fetch of the GLOBAL value that works for multi-process
    arrays: fully-addressable (replicated / single-process) arrays convert
    directly; sharded global arrays are allgathered across processes
    (tiled=True reassembles the global shape from the per-process shards)."""
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
