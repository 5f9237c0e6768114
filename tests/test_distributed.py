import pytest as _pytest_slowmark
pytestmark = _pytest_slowmark.mark.slow
"""Multi-host (multi-process) entry point tests (BASELINE config 5).

The reference has no distributed anything (single optixLaunch on one
stream, src/GaussianTracer.cpp:504,525). Here two genuinely separate OS
processes, 4 virtual CPU devices each, join via
jax.distributed.initialize into one 8-device world and run the SAME
sharded renderer used single-process; the result must match the
single-process 8-device render bit-for-bit. This is the standard JAX way
to demonstrate multi-host logic without a pod — on real hardware only the
device list changes (ICI/DCN collectives instead of gloo).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import RenderConfig
from gaussian_ray_tracing_tpu.parallel.mesh import make_mesh
from gaussian_ray_tracing_tpu.parallel.sharded import render_tiled_sharded
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "rgb.npy"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=420)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    rgb_mp = np.load(out)

    # single-process 8-virtual-device reference (this pytest process)
    mesh = make_mesh(8)
    scene = random_scene(500, seed=2)
    cam = Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0), width=64, height=64
    )
    cfg = RenderConfig(hit_multiplicity=1, order="key")
    ref = np.asarray(
        render_tiled_sharded(scene, cam, cfg, mesh, pair_capacity=40_000)["rgb"]
    )
    np.testing.assert_array_equal(rgb_mp, ref)


def test_initialize_is_idempotent_single_process():
    from gaussian_ray_tracing_tpu.parallel import distributed

    # in-process: already single-process initialized backends; the wrapper
    # must not try to re-initialize once marked
    distributed._initialized = True
    distributed.initialize_distributed()
    assert not distributed.is_multiprocess()


def test_global_array_single_process_replicates():
    from jax.sharding import PartitionSpec as P

    from gaussian_ray_tracing_tpu.parallel import distributed

    mesh = make_mesh(8)
    x = np.arange(16.0).reshape(8, 2)
    rep = distributed.global_array(x, mesh)
    np.testing.assert_array_equal(np.asarray(rep), x)
    shd = distributed.global_array(x, mesh, P("rays"))
    np.testing.assert_array_equal(np.asarray(shd), x)
    np.testing.assert_array_equal(distributed.fetch(shd), x)
