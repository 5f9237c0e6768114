"""CPU-runnable full-config parity tier (VERDICT r4 item 6).

The 720p/`slow`-marked goldens (tests/test_golden_fullframe.py) take >10
minutes each on a CPU host, so in practice full-frame parity was only
asserted by the on-chip bench gate. This tier runs the SAME camera/hm
configuration matrix — pinhole, equisolid fisheye, hit_multiplicity=2 —
at 256^2 against exact per-ray-ordered oracle goldens
(scripts/make_goldens.py, models/oracle.py = shaders/tracer.cuh:328-373
semantics), through the production ordering config (order="window",
march_chunk=128), and finishes in seconds. It runs in the default pytest
subset: `pytest -m "not slow"` asserts >= 40 dB end to end on all three
configs on every run.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "golden",
)


def _load(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated (scripts/make_goldens.py)")
    z = np.load(path)
    n, seed, width, height, hm, fisheye = (int(v) for v in z["meta"])
    config = RenderConfig(
        hit_multiplicity=hm,
        camera_model=(CameraModel.FISHEYE if fisheye else CameraModel.PINHOLE),
        order="window",
        march_chunk=128,  # the production/bench parity config
        max_per_tile=4096,
    )
    scene = random_scene(n, seed=seed)
    camera = Camera.create(
        eye=(0.0, 0.3, 2.8), lookat=(0.0, 0.0, 0.0),
        width=width, height=height,
    )
    return z["rgb"].astype(np.float32), scene, camera, config


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32) - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.parametrize(
    "name", ["small_pinhole_256", "small_fisheye_256", "small_hm2_256"]
)
def test_small_fullconfig_parity(name):
    ref, scene, camera, config = _load(name)
    cap = 1 << 18
    for _ in range(4):
        out = render(scene, camera, config, method="tiled",
                     pair_capacity=cap, return_aux=True)
        if int(out["aux"]["n_dropped"]) == 0:
            break
        cap *= 2
    assert int(out["aux"]["n_dropped"]) == 0
    p = _psnr(out["rgb"], ref)
    assert p >= 40.0, f"{name}: 256^2 PSNR {p:.2f} < 40 vs exact oracle"
