"""Full-frame, full-config parity goldens (VERDICT round-1 item 5).

Each golden in data/golden/*.npz is a FULL-FRAME render by the exact
per-ray-ordered oracle (models/oracle.py — the reference semantics of
shaders/tracer.cuh:328-373), precomputed by scripts/make_goldens.py.
These tests assert the PRODUCTION path clears the BASELINE parity bar
(PSNR >= 40) at full frame — replacing the round-1 docstring claims that
were only ever tested on 96x64 crops:

  pinhole_720p  1280x720 pinhole, 20k synthetic scene, hit_multiplicity=1
  fisheye_720   720x720 equisolid fisheye (blanked r > 1 ring,
                shaders/tracer.cuh:153-161)
  hm2_360p      640x360 pinhole, hit_multiplicity=2 (the reference's
                config default: icosahedron hulls report 2 anyhits)

The production path under test is the XLA tiled renderer with
order="window" and the bench march_chunk — the same ordering semantics the
Pallas kernel implements (kernel-vs-tiled equivalence is pinned separately
in tests/test_pallas.py; the kernel's interpret mode is too slow at 720p).
"""

from __future__ import annotations

import pytest as _pytest_slowmark
pytestmark = _pytest_slowmark.mark.slow  # deselect with -m 'not slow'

import os

import numpy as np
import pytest

from gaussian_ray_tracing_tpu.cameras import Camera
from gaussian_ray_tracing_tpu.config import CameraModel, RenderConfig
from gaussian_ray_tracing_tpu.models.renderer import render
from gaussian_ray_tracing_tpu.scene.synthetic import random_scene

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "data", "golden")


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
        # window/128 is the parity config for BOTH camera models since
        # the round-4 exact fisheye cone caps: fewer dead pairs per chunk
        # widen the effective sort window (fisheye /128: 36.5 dB with the
        # old loose rects -> 45.4 vs the same golden)
        march_chunk=128,
        # the XLA tiled path clips per-tile candidate lists at max_per_tile
        # (the Pallas pair stream has no such cap): hm2_360p's densest tile
        # holds ~1050 candidates, fisheye's conservative rects more — raise
        # the cap so drops cannot masquerade as parity failures
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
    "name", ["pinhole_720p", "fisheye_720", "hm2_360p", "hm2_720p"]
)
def test_fullframe_parity(name):
    ref, scene, camera, config = _load(name)
    # drop-free capacity (silently dropped pairs read as parity failures;
    # fisheye's conservative footprint rects emit ~2.3x the pinhole count)
    cap = 1 << 20
    for _ in range(3):
        out = render(scene, camera, config, method="tiled",
                     pair_capacity=cap, return_aux=True)
        if int(out["aux"]["n_dropped"]) == 0:
            break
        cap *= 2
    assert int(out["aux"]["n_dropped"]) == 0
    p = _psnr(out["rgb"], ref)
    assert p >= 40.0, f"{name}: full-frame PSNR {p:.2f} < 40 vs exact oracle"
